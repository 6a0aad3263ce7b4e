"""End-to-end behavior-cVAE + flow training slice on synthetic data,
sharded over the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from behavior_driven_video_synthesis_tpu.core import Config
from behavior_driven_video_synthesis_tpu.data import SyntheticSequenceDataset
from behavior_driven_video_synthesis_tpu.models import (
    ResidualBehaviorNet,
    ClassifierAction,
    ClassifierActionBeta,
    RegressorFly,
)
from behavior_driven_video_synthesis_tpu.models.discriminators import (
    SequenceDiscMichael,
)
from behavior_driven_video_synthesis_tpu.models.flows import LatentFlow
from behavior_driven_video_synthesis_tpu.parallel import (
    make_mesh,
    shard_batch,
    replicate,
)
from behavior_driven_video_synthesis_tpu.train.behavior import (
    create_behavior_state,
    make_behavior_train_step,
    make_behavior_eval_step,
)
from behavior_driven_video_synthesis_tpu.train.flow import (
    create_flow_state,
    make_flow_train_step,
)

N_KPS, HID, T_FULL, BS, N_ACT = 24, 64, 17, 16, 5
SEQ_LEN = T_FULL - 1


@pytest.fixture(scope="module")
def setup():
    config = Config({
        "architecture": {"dim_hidden_b": HID, "cvae": False},
        "training": {
            "recon_loss_weight": 2.5, "weight_regressor": 0.01,
            "use_regressor": True, "gamma_step": 1e-4,
            "information_max": 10.0, "lr_init": 1e-3,
        },
    })
    model = ResidualBehaviorNet(n_kps=N_KPS, dim_hidden_b=HID)
    regressor = RegressorFly(n_out=N_KPS, seq_length=SEQ_LEN)
    cls_action = ClassifierAction(n_classes=N_ACT, dim=64)
    cls_action2 = SequenceDiscMichael(layers=(2, 1, 1, 1), out_dim=N_ACT)
    cls_beta = ClassifierActionBeta(n_classes=N_ACT)
    txs = {k: optax.adam(1e-3) for k in
           ["net", "regressor", "cls_action", "cls_action2", "cls_beta"]}
    ds = SyntheticSequenceDataset(n_samples=256, seq_length=T_FULL,
                                  n_kps=N_KPS, n_actions=N_ACT)
    sample = next(ds.batches(BS))
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    state = create_behavior_state(
        jax.random.PRNGKey(0), model, regressor, cls_action, cls_action2,
        cls_beta, txs, sample, SEQ_LEN)
    step_fn = make_behavior_train_step(
        model, regressor, cls_action, cls_action2, cls_beta, txs, config,
        SEQ_LEN)
    return config, model, ds, state, step_fn, txs


class TestBehaviorTraining:
    def test_loss_decreases(self, setup):
        _, model, ds, state, step_fn, _ = setup
        jit_step = jax.jit(step_fn, static_argnames=("enable_net_update",))
        losses = []
        key = jax.random.PRNGKey(1)
        for epoch in range(6):
            for batch in ds.batches(BS, seed=epoch):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                key, sub = jax.random.split(key)
                state, metrics = jit_step(state, batch, sub)
                losses.append(float(metrics["loss_recon"]))
        assert losses[-1] < 0.5 * np.mean(losses[:5]), (
            f"recon did not improve: first5={np.mean(losses[:5]):.4f} "
            f"last={losses[-1]:.4f}")
        # KL finite, gamma non-negative
        assert float(state.gamma) >= 0.0
        self._trained_state = state

    def test_sharded_over_mesh(self, setup):
        _, model, ds, state, step_fn, _ = setup
        mesh = make_mesh(8)
        state = replicate(state, mesh)
        jit_step = jax.jit(step_fn, static_argnames=("enable_net_update",))
        batch = next(ds.batches(BS))
        batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                            mesh)
        key = replicate(jax.random.PRNGKey(2), mesh)
        state2, metrics = jit_step(state, batch, key)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["grad_norm"]) > 0.0  # wandb.watch equivalent
        # params stay replicated, batch metrics are scalars
        assert float(metrics["acc_classifier_action"]) >= 0.0

    def test_disable_net_update_freezes_params(self, setup):
        _, model, ds, state, step_fn, _ = setup
        jit_step = jax.jit(step_fn, static_argnames=())
        batch = next(ds.batches(BS))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state2, _ = jit_step(state, batch, jax.random.PRNGKey(3),
                             jnp.asarray(False))
        leaves0 = jax.tree_util.tree_leaves(state.net.params)
        leaves1 = jax.tree_util.tree_leaves(state2.net.params)
        for a, b in zip(leaves0, leaves1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # probes still train
        r0 = jax.tree_util.tree_leaves(state.regressor.params)
        r1 = jax.tree_util.tree_leaves(state2.regressor.params)
        assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
                   for a, b in zip(r0, r1))

    def test_eval_step(self, setup):
        _, model, ds, state, step_fn, _ = setup
        eval_fn = jax.jit(make_behavior_eval_step(model, SEQ_LEN))
        batch = next(ds.batches(BS))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        metrics, xs = eval_fn(state.net.params, batch, jax.random.PRNGKey(0))
        assert xs.shape == (BS, SEQ_LEN, N_KPS)
        assert np.isfinite(float(metrics["recon_mse"]))


class TestFlowStage:
    def test_flow_trains_on_frozen_net(self, setup):
        _, model, ds, state, step_fn, _ = setup
        flow_model = LatentFlow(flow_in_channels=HID,
                                flow_mid_channels=2 * HID, n_flows=4)
        tx = optax.adam(1e-3)

        # real-batch init for ActNorm
        batch = next(ds.batches(BS))
        seq_b = jnp.asarray(batch["keypoints"])[:, :-1]
        b, *_ = model.apply({"params": state.net.params}, seq_b, sample=False,
                            rngs={"sample": jax.random.PRNGKey(0)},
                            method=model.infer_b)
        fstate = create_flow_state(jax.random.PRNGKey(1), flow_model, tx, b)

        flow_step = jax.jit(make_flow_train_step(model, flow_model, tx,
                                                 SEQ_LEN))
        losses = []
        key = jax.random.PRNGKey(2)
        for epoch in range(3):
            for b_ in ds.batches(BS, seed=10 + epoch):
                b_ = {k: jnp.asarray(v) for k, v in b_.items()}
                key, sub = jax.random.split(key)
                fstate, fmetrics = flow_step(fstate, state.net.params, b_,
                                             sub)
                losses.append(float(fmetrics["flow_loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])

        # sampling through the inverse is finite and correctly shaped
        variables = {"params": fstate.flow.params,
                     "buffers": fstate.flow.buffers}
        samples = flow_model.apply(variables, jax.random.PRNGKey(3), 7,
                                   method=flow_model.sample)
        assert samples.shape == (7, HID)
        assert np.isfinite(np.asarray(samples)).all()


class TestFSDP:
    def test_fsdp_flow_step_matches_replicated(self, setup):
        """FSDP/ZeRO-3 flow training (params + adam moments sharded over the
        data axis) must produce the same loss as the replicated layout, keep
        every large leaf evenly split 1/N per device, and — via
        out_shardings — return the updated state in the same layout."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from behavior_driven_video_synthesis_tpu.parallel import (
            shard_module_state_fsdp,
            state_shardings,
        )
        _, model, ds, state, step_fn, _ = setup
        flow_model = LatentFlow(flow_in_channels=HID,
                                flow_mid_channels=2 * HID, n_flows=2)
        tx = optax.adam(1e-3)

        batch = next(ds.batches(BS))
        seq_b = jnp.asarray(batch["keypoints"])[:, :-1]
        b, *_ = model.apply({"params": state.net.params}, seq_b, sample=False,
                            rngs={"sample": jax.random.PRNGKey(0)},
                            method=model.infer_b)
        fstate0 = create_flow_state(jax.random.PRNGKey(1), flow_model, tx, b)
        step = make_flow_train_step(model, flow_model, tx, SEQ_LEN)

        mesh = make_mesh(8)
        batch_dev = shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                                mesh)
        net_rep = replicate(state.net.params, mesh)
        key = replicate(jax.random.PRNGKey(7), mesh)

        # replicated baseline (no donation: fstate0 is reused below)
        s_rep = replicate(fstate0, mesh)
        _, m_rep = jax.jit(step)(s_rep, net_rep, batch_dev, key)

        # FSDP: shard, pin the output layout, donate
        s_f = shard_module_state_fsdp(fstate0, mesh, min_size=1024)
        out_sh = (state_shardings(s_f), NamedSharding(mesh, P()))
        fstep = jax.jit(step, donate_argnums=(0,), out_shardings=out_sh)
        s_f2, m_f = fstep(s_f, net_rep, batch_dev, key)

        np.testing.assert_allclose(float(m_rep["flow_loss"]),
                                   float(m_f["flow_loss"]), rtol=1e-4)

        def _sharded_leaves(tree):
            return [l for l in jax.tree_util.tree_leaves(tree)
                    if "data" in str(l.sharding.spec)]

        for tree, name in ((s_f2.flow.params, "params"),
                           (s_f2.flow.opt_state, "opt_state")):
            leaves = _sharded_leaves(tree)
            assert leaves, f"FSDP produced no data-sharded flow {name}"
            big = max(leaves, key=lambda l: l.size)
            shard_sz = big.addressable_shards[0].data.size
            assert shard_sz * 8 == big.size, (
                f"{name} leaf not evenly sharded: "
                f"{shard_sz}*8 != {big.size}")

        # small leaves (biases under min_size) stay replicated
        small = [l for l in jax.tree_util.tree_leaves(s_f2.flow.params)
                 if l.size < 1024]
        assert small and all("data" not in str(l.sharding.spec)
                             for l in small)

    def test_fsdp_spec_rule(self):
        """Largest-divisible-dim rule: big leaves shard on their largest
        dim divisible by the axis size; small/indivisible leaves replicate."""
        from jax.sharding import PartitionSpec as P
        from behavior_driven_video_synthesis_tpu.parallel import (
            infer_fsdp_shardings,
        )
        mesh = make_mesh(8)
        tree = {
            "w_big": jnp.zeros((128, 256)),     # shard dim 1 (256 > 128)
            "w_tall": jnp.zeros((512, 7)),      # shard dim 0 (7 % 8 != 0)
            "bias": jnp.zeros((256,)),          # under min_size -> replicate
            "odd": jnp.zeros((129, 131)),       # nothing divisible
            "scalar": jnp.zeros(()),
        }
        sh = infer_fsdp_shardings(tree, mesh, min_size=1 << 14)
        assert sh["w_big"].spec == P(None, "data")
        # 512x7 = 3584 elements < 1<<14 -> replicated despite divisible dim
        assert sh["w_tall"].spec == P()
        sh = infer_fsdp_shardings(tree, mesh, min_size=1024)
        assert sh["w_tall"].spec == P("data", None)
        assert sh["bias"].spec == P()  # 256 < 1024
        assert sh["odd"].spec == P()
        assert sh["scalar"].spec == P()


class TestHybridSharding:
    def test_dp_x_tp_step_matches_dp(self, setup):
        """The dp x tp hybrid layout must produce the same loss as pure dp
        (sharding changes placement, not math)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from behavior_driven_video_synthesis_tpu.parallel import (
            shard_module_state,
        )
        _, model, ds, state, step_fn, _ = setup
        jit_step = jax.jit(step_fn, static_argnames=("enable_net_update",))
        batch_np = next(ds.batches(BS))

        mesh_dp = make_mesh(8)
        s_dp = replicate(state, mesh_dp)
        b_dp = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()},
                           mesh_dp)
        k_dp = replicate(jax.random.PRNGKey(5), mesh_dp)
        _, m_dp = jit_step(s_dp, b_dp, k_dp)

        mesh_tp = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        s_tp = shard_module_state(state, mesh_tp, min_dim=64)
        b_tp = {k: jax.device_put(jnp.asarray(v),
                                  NamedSharding(mesh_tp, P("data")))
                for k, v in batch_np.items()}
        k_tp = jax.device_put(jax.random.PRNGKey(5),
                              NamedSharding(mesh_tp, P()))
        s_tp2, m_tp = jit_step(s_tp, b_tp, k_tp)

        np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                                   rtol=1e-4)
        w_hh = s_tp2.net.params["b_enc"]["rnn"]["w_hh"]
        assert "model" in str(w_hh.sharding.spec)
