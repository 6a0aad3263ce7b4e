"""Training-dynamics (gradient-path) parity vs the LIVING reference.

Forward parity (tests/test_reference_parity.py) runs entirely under
``torch.no_grad`` and cannot catch a wrong gradient.  This tier
lockstep-trains the behavior cVAE against /root/reference on CPU in f32:
identical init (via models/convert.py), identical batches, identical
injected noise/indices, N optimizer steps — asserting per-step loss
trajectories AND final parameter states.

What this exercises that nothing else does:
  * weight-norm backward (torch ``weight_norm`` vs our (v, g)
    decomposition in NormDense/NormConv2d),
  * LSTM/scan backward through the T-step rollout,
  * the adversarial clamp-and-subtract coupling into the net gradient
    (reference experiments/behavior_net.py:642-654: the 5th inner-loop
    regressor loss — computed against the regressor after 4 inner
    updates — is subtracted twice, clamped at 0.45 and 0.7),
  * the gamma controller trajectory (:111-116, gamma updated from each
    step's KL),
  * torch-Adam vs optax semantics (train.state.torch_adam), with an SGD
    arm first to isolate optimizer algebra from gradient algebra.

Reference sequencing is mirrored EXACTLY here (regressor inner loop
before the net update; the beta probe trained on a fresh post-update
forward).  The shipped step (train/behavior.py) deliberately reorders
for one-forward purity; its divergence from the reference order is
quantified separately in test_shipped_step_divergence_is_bounded and
PARITY.md §2.2.

Stochasticity injection: every ``torch.randn_like`` eps draw and every
``torch.randint`` frame index is replaced by pre-generated numpy arrays
fed to BOTH sides (same distribution, so reference semantics are
preserved; the draws are not part of model semantics).
"""
import copy
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from behavior_driven_video_synthesis_tpu.models import ResidualBehaviorNet
from behavior_driven_video_synthesis_tpu.models.convert import (
    convert_behavior_net,
    convert_classifier_action,
    convert_classifier_action_beta,
    convert_regressor_fly,
    convert_sequence_disc_michael,
)
from behavior_driven_video_synthesis_tpu.models.discriminators import (
    SequenceDiscMichael,
)
from behavior_driven_video_synthesis_tpu.models.probes import (
    ClassifierAction,
    ClassifierActionBeta,
    RegressorFly,
)
from behavior_driven_video_synthesis_tpu.train.losses import (
    cross_entropy,
    kl_loss,
    mse_loss,
)
from behavior_driven_video_synthesis_tpu.train.state import torch_adam

REF_ROOT = os.environ.get("BDVS_REFERENCE_ROOT", "/root/reference")

# small-but-real config: T=50 is pinned by the reference Regressor_fly's
# hard-coded fc4 = Linear(50, 128) (pose_behavior_rnn.py:55)
B, T, K, H, NA = 6, 50, 16, 64, 6
N_STEPS = 20
RECON_W, W_REG = 2.5, 0.01
# imax/gamma chosen so the controller moves BOTH directions within
# N_STEPS (with the yaml's imax=100 and gamma0=0, gamma would sit
# clamped at 0 for the whole window and the test would prove nothing)
GAMMA_STEP, IMAX, GAMMA0 = 1e-3, 1.0, 0.05


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF_ROOT):
        pytest.skip(f"reference checkout not present at {REF_ROOT}")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    torch.Tensor.get_device = lambda self: self.device
    import models.pose_behavior_rnn as rbn_mod
    import models.pose_discriminator as pd_mod
    return dict(torch=torch, rbn=rbn_mod, pd=pd_mod)


def _gen_batches(seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(N_STEPS):
        out.append(dict(
            kps=(rng.randn(B, T + 1, K) * 0.5).astype(np.float32),
            kps_cross=(rng.randn(B, T + 1, K) * 0.5).astype(np.float32),
            labels=rng.randint(0, NA, B).astype(np.int64),
            eps1=rng.randn(B, H).astype(np.float32),
            eps2=rng.randn(B, H).astype(np.float32),
            eps3=rng.randn(B, H).astype(np.float32),
            ts=rng.randint(0, T, 5),
        ))
    return out


# --------------------------------------------------------------- torch side
class _DataOpt:
    """torch-1.x-faithful optimizer: updates ``p.data`` in place, which
    does NOT bump autograd version counters.  The reference's live inner
    loop (behavior_net.py:642-654) steps the regressor optimizer while
    its forward graph is still needed by the later ``loss.backward()`` —
    legal on the torch 1.x the reference ran under, a version-counter
    RuntimeError on modern torch whose optimizers update params directly
    under no_grad.  Semantics (SGD / Adam update algebra incl. L2-in-grad
    weight decay) match torch.optim exactly."""

    def __init__(self, torch, params, lr, kind, weight_decay=0.0,
                 betas=(0.9, 0.999), eps=1e-8):
        self.torch, self.params = torch, list(params)
        self.lr, self.kind, self.wd = lr, kind, weight_decay
        self.b1, self.b2, self.eps = betas[0], betas[1], eps
        self.t = 0
        self.m = [torch.zeros_like(p.data) for p in self.params]
        self.v = [torch.zeros_like(p.data) for p in self.params]

    def zero_grad(self):
        for p in self.params:
            if p.grad is not None:
                p.grad.detach_()
                p.grad.zero_()

    def step(self):
        torch = self.torch
        self.t += 1
        with torch.no_grad():
            for p, m, v in zip(self.params, self.m, self.v):
                if p.grad is None:
                    continue
                g = p.grad.detach()
                if self.wd:
                    g = g + self.wd * p.data
                if self.kind == "sgd":
                    p.data.add_(g, alpha=-self.lr)
                    continue
                m.mul_(self.b1).add_(g, alpha=1 - self.b1)
                v.mul_(self.b2).addcmul_(g, g, value=1 - self.b2)
                mh = m / (1 - self.b1 ** self.t)
                vh = v / (1 - self.b2 ** self.t)
                p.data.addcdiv_(mh, vh.sqrt().add_(self.eps),
                                value=-self.lr)


def _torch_optims(ref, nets, kind):
    torch = ref["torch"]
    net, reg, ca, ca2, cb = nets
    net_params = list(net.b_enc.parameters()) + list(net.decoder.parameters())
    if kind == "sgd":
        return tuple(_DataOpt(torch, ps, 1e-4, "sgd") for ps in (
            net_params, reg.parameters(), ca.parameters(),
            ca2.parameters(), cb.parameters()))
    # the reference's exact hyperparameters (behavior_net.py:288-306,334)
    return (_DataOpt(torch, net_params, 1e-4, "adam"),
            _DataOpt(torch, reg.parameters(), 1e-4, "adam"),
            _DataOpt(torch, ca.parameters(), 1e-4, "adam",
                     weight_decay=1e-4),
            _DataOpt(torch, ca2.parameters(), 1e-4, "adam",
                     weight_decay=1e-5),
            _DataOpt(torch, cb.parameters(), 1e-3, "adam"))


def _run_reference(ref, batches, kind):
    """Drive the living reference models through train_fn's exact body
    (experiments/behavior_net.py:590-732), with eps/index injection."""
    torch = ref["torch"]
    torch.manual_seed(0)
    net = ref["rbn"].ResidualBehaviorNet(
        n_kps=K, information_bottleneck=True, dim_hidden_b=H)
    reg = ref["rbn"].Regressor_fly(H, K)
    ca = ref["rbn"].Classifier_action(K, NA, dropout=0, dim=512)
    ca2 = ref["pd"].Sequence_disc_michael([2, 1, 1, 1], K, out_dim=NA)
    cb = ref["rbn"].Classifier_action_beta(H, NA)
    nets = (net, reg, ca, ca2, cb)
    init_sds = [copy.deepcopy(
        {k: v.detach().numpy().copy() for k, v in m.state_dict().items()})
        for m in nets]
    o_net, o_reg, o_ca, o_ca2, o_cb = _torch_optims(ref, nets, kind)

    ce = torch.nn.CrossEntropyLoss()
    gamma = GAMMA0
    eps_queue = []
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t, **kw: eps_queue.pop(0)
    metrics = []
    try:
        for n_it, bt in enumerate(batches):
            eps_queue[:] = [torch.from_numpy(bt[k])
                            for k in ("eps1", "eps2", "eps3")]
            kps = torch.from_numpy(bt["kps"])
            seq_b, target = kps[:, :-1], kps[:, 1:]
            seq_2 = torch.from_numpy(bt["kps_cross"])[:, :-1]
            labels = torch.from_numpy(bt["labels"])

            xs, cs, _, bs, mu_s, logstd_s, pre_s = net(seq_b, seq_b, T)
            recon = torch.mean((xs - target) ** 2)
            std = torch.exp(logstd_s)
            kl = (torch.sum(-logstd_s + 0.5 * (std ** 2 + mu_s ** 2),
                            dim=-1) - 0.5 * H).mean()
            _ = net(seq_2, seq_b, T)          # transfer fwd: consumes eps2
            loss = RECON_W * recon + gamma * kl
            for i in range(5):
                t = int(bt["ts"][i])
                oh = torch.nn.functional.one_hot(
                    torch.full((B,), t, dtype=torch.long), T).float()
                loss_regressor = torch.mean(
                    (reg(mu_s, oh) - seq_b[:, t]) ** 2)
                o_reg.zero_grad()
                loss_regressor.backward(retain_graph=True)
                o_reg.step()
            loss = loss - torch.clamp(loss_regressor, max=0.45) * W_REG
            loss = loss - torch.clamp(loss_regressor, max=0.7) * W_REG
            o_net.zero_grad()
            loss.backward()
            o_net.step()
            # the reference's live imax: initialized 0, set by the
            # ITERATION_COMPLETED hook only after iteration 1
            # (behavior_net.py:60,784)
            imax_t = 0.0 if n_it == 0 else IMAX
            gamma = max(gamma - GAMMA_STEP * (imax_t - kl.item()), 0)

            pred = ca(seq_b)[0]
            l_ca = ce(pred, labels)
            o_ca.zero_grad(); l_ca.backward(); o_ca.step()
            pred2 = ca2((seq_b[:, 1:] - seq_b[:, :-1]).transpose(1, 2))[0]
            l_ca2 = ce(pred2, labels)
            o_ca2.zero_grad(); l_ca2.backward(); o_ca2.step()
            _, _, _, _, mu_post, *_ = net(seq_b, seq_b, T)   # eps3
            predb = cb(mu_post)
            l_cb = ce(predb, labels)
            o_cb.zero_grad(); l_cb.backward(); o_cb.step()

            metrics.append(dict(
                recon=recon.item(), kl=kl.item(), loss=loss.item(),
                loss_reg=loss_regressor.item(), gamma=gamma,
                ca=l_ca.item(), ca2=l_ca2.item(), cb=l_cb.item()))
    finally:
        torch.randn_like = orig_randn_like
    final_sds = [copy.deepcopy(
        {k: v.detach().numpy().copy() for k, v in m.state_dict().items()})
        for m in nets]
    return init_sds, metrics, final_sds


# ----------------------------------------------------------------- jax side
def _convert_all(sds):
    net_p = convert_behavior_net(sds[0])["params"]
    reg_p = convert_regressor_fly(sds[1])["params"]
    ca_p = convert_classifier_action(sds[2])["params"]
    ca2_p = convert_sequence_disc_michael(sds[3])["params"]
    cb_p = convert_classifier_action_beta(sds[4])["params"]
    return [net_p, reg_p, ca_p, ca2_p, cb_p]


def _jax_txs(kind):
    if kind == "sgd":
        return [optax.sgd(1e-4)] * 5
    return [torch_adam(1e-4), torch_adam(1e-4),
            torch_adam(1e-4, weight_decay=1e-4),
            torch_adam(1e-4, weight_decay=1e-5),
            torch_adam(1e-3)]


def _run_ours_reference_order(batches, init_sds, kind, monkeypatch):
    """Mirror train_fn's exact sequencing with our models/losses/optax."""
    model = ResidualBehaviorNet(n_kps=K, dim_hidden_b=H)
    reg = RegressorFly(n_out=K, seq_length=T)
    ca = ClassifierAction(n_classes=NA, dim=512)
    ca2 = SequenceDiscMichael(layers=(2, 1, 1, 1), out_dim=NA)
    cb = ClassifierActionBeta(n_classes=NA)
    params = _convert_all(init_sds)
    txs = _jax_txs(kind)
    opts = [tx.init(p) for tx, p in zip(txs, params)]

    holder = {"eps": None}
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.asarray(
            holder["eps"], dtype))
    rngs = {"sample": jax.random.PRNGKey(0)}
    gamma = GAMMA0
    metrics = []

    def upd(i, grads):
        u, opts[i] = txs[i].update(grads, opts[i], params[i])
        params[i] = optax.apply_updates(params[i], u)

    for n_it, bt in enumerate(batches):
        kps = jnp.asarray(bt["kps"])
        seq_b, target = kps[:, :-1], kps[:, 1:]
        labels = jnp.asarray(bt["labels"], jnp.int32)
        holder["eps"] = bt["eps1"]

        # regressor inner loop first (on the same mu the net forward
        # produces — same params + same injected eps => identical mu)
        _, _, _, mu0, _, _ = model.apply(
            {"params": params[0]}, seq_b, seq_b, T, rngs=rngs)
        mu0 = jax.lax.stop_gradient(mu0)
        reg_params_adv = None
        loss_reg = None
        for i in range(5):
            if i == 4:
                reg_params_adv = params[1]      # after 4 inner updates
            t = int(bt["ts"][i])
            oh = jax.nn.one_hot(jnp.full((B,), t), T)
            tgt = seq_b[:, t]

            def reg_loss_fn(rp):
                return mse_loss(reg.apply({"params": rp}, mu0, oh), tgt)

            loss_reg, rg = jax.value_and_grad(reg_loss_fn)(params[1])
            upd(1, rg)
        t5 = int(bt["ts"][4])
        oh5 = jax.nn.one_hot(jnp.full((B,), t5), T)

        def net_loss_fn(p):
            xs, cs, b, mu, logstd, pre = model.apply(
                {"params": p}, seq_b, seq_b, T, rngs=rngs)
            recon = mse_loss(xs, target)
            kl = kl_loss(mu, logstd)
            loss = RECON_W * recon + gamma * kl
            pred = reg.apply(
                {"params": jax.lax.stop_gradient(reg_params_adv)}, mu, oh5)
            lr5 = mse_loss(pred, seq_b[:, t5])
            loss = loss - jnp.clip(lr5, max=0.45) * W_REG
            loss = loss - jnp.clip(lr5, max=0.7) * W_REG
            return loss, (recon, kl)

        (loss, (recon, kl)), g = jax.value_and_grad(
            net_loss_fn, has_aux=True)(params[0])
        upd(0, g)
        imax_t = 0.0 if n_it == 0 else IMAX        # reference live imax
        gamma = max(gamma - GAMMA_STEP * (imax_t - float(kl)), 0)

        def ca_loss_fn(p):
            return cross_entropy(ca.apply({"params": p}, seq_b)[0], labels)

        l_ca, g = jax.value_and_grad(ca_loss_fn)(params[2])
        upd(2, g)
        vel = seq_b[:, 1:] - seq_b[:, :-1]

        def ca2_loss_fn(p):
            return cross_entropy(ca2.apply({"params": p}, vel)[0], labels)

        l_ca2, g = jax.value_and_grad(ca2_loss_fn)(params[3])
        upd(3, g)

        holder["eps"] = bt["eps3"]
        _, _, _, mu_post, _, _ = model.apply(
            {"params": params[0]}, seq_b, seq_b, T, rngs=rngs)
        mu_post = jax.lax.stop_gradient(mu_post)

        def cb_loss_fn(p):
            return cross_entropy(cb.apply({"params": p}, mu_post), labels)

        l_cb, g = jax.value_and_grad(cb_loss_fn)(params[4])
        upd(4, g)

        metrics.append(dict(
            recon=float(recon), kl=float(kl), loss=float(loss),
            loss_reg=float(loss_reg), gamma=gamma,
            ca=float(l_ca), ca2=float(l_ca2), cb=float(l_cb)))
    return params, metrics


# ------------------------------------------------------------- comparisons
def _traj_max_rel(mref, mours, key):
    r = np.asarray([m[key] for m in mref], np.float64)
    o = np.asarray([m[key] for m in mours], np.float64)
    return float(np.max(np.abs(r - o) / (np.abs(r) + 1e-6)))


def _param_rel_errs(final_ref_sds, final_ours, init_sds):
    """Per-module: ||ours - ref||_2 / ||ref - init||_2 — error relative
    to how far training actually moved the params.  L2 (not max-norm):
    Adam's update direction for leaves whose true gradient is ~0 is the
    SIGN of fp32 noise, so isolated scalars can land lr*N apart on both
    perfectly-correct implementations; the L2 ratio keeps those
    measure-zero leaves from dominating while still catching any
    systematic gradient error (which moves whole tensors)."""
    finals = _convert_all(final_ref_sds)
    inits = _convert_all(init_sds)
    rels = []
    for ref_p, our_p, init_p in zip(finals, final_ours, inits):
        flat_r = jnp.concatenate([jnp.ravel(x) for x in
                                  jax.tree_util.tree_leaves(ref_p)])
        flat_o = jnp.concatenate([jnp.ravel(x) for x in
                                  jax.tree_util.tree_leaves(our_p)])
        flat_i = jnp.concatenate([jnp.ravel(x) for x in
                                  jax.tree_util.tree_leaves(init_p)])
        move = float(jnp.linalg.norm(flat_r - flat_i)) + 1e-8
        rels.append(float(jnp.linalg.norm(flat_o - flat_r)) / move)
    return rels


NAMES = ("net", "regressor", "cls_action", "cls_action2", "cls_beta")


@pytest.mark.parametrize("kind", ["sgd", "adam"])
def test_behavior_lockstep_training_parity(ref, monkeypatch, kind):
    batches = _gen_batches()
    init_sds, m_ref, final_sds = _run_reference(ref, batches, kind)
    final_ours, m_ours = _run_ours_reference_order(
        batches, init_sds, kind, monkeypatch)

    # loss trajectories: every logged scalar, every step
    tol = {"sgd": 2e-3, "adam": 2e-3}[kind]
    for key in ("recon", "kl", "loss", "loss_reg", "gamma",
                "ca", "ca2", "cb"):
        rel = _traj_max_rel(m_ref, m_ours, key)
        assert rel < tol, (
            f"{kind}: '{key}' trajectory diverged (max rel {rel:.2e}); "
            f"ref={[m[key] for m in m_ref[:5]]} "
            f"ours={[m[key] for m in m_ours[:5]]}")

    # final params, relative to the training movement
    rels = _param_rel_errs(final_sds, final_ours, init_sds)
    ptol = {"sgd": 5e-3, "adam": 2e-2}[kind]
    for name, rel in zip(NAMES, rels):
        assert rel < ptol, (
            f"{kind}: final '{name}' params off by {rel:.2e} of the "
            f"training movement (tol {ptol})")


def test_shipped_step_divergence_is_bounded(ref, monkeypatch):
    """The SHIPPED step (train/behavior.py) deliberately reorders the
    reference's sequencing (PARITY.md §2.2: adversarial term vs the
    CURRENT regressor with its own index draw, regressor updated after;
    beta probe on the pre-update mu).  Quantify that divergence against
    the reference trajectory: same init, same batches, same eps — the
    loss curves must track within a few percent over N steps and the net
    must move to the same neighborhood."""
    from behavior_driven_video_synthesis_tpu.core import schedules

    batches = _gen_batches()
    init_sds, m_ref, final_sds = _run_reference(ref, batches, "adam")

    # shipped-step semantics, driven with the same injected draws
    model = ResidualBehaviorNet(n_kps=K, dim_hidden_b=H)
    reg = RegressorFly(n_out=K, seq_length=T)
    params = _convert_all(init_sds)[:2]
    txs = [torch_adam(1e-4), torch_adam(1e-4)]
    opts = [tx.init(p) for tx, p in zip(txs, params)]
    holder = {"eps": None}
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.asarray(
            holder["eps"], dtype))
    rngs = {"sample": jax.random.PRNGKey(0)}
    gamma = GAMMA0
    m_ours = []
    for n, bt in enumerate(batches):
        kps = jnp.asarray(bt["kps"])
        seq_b, target = kps[:, :-1], kps[:, 1:]
        holder["eps"] = bt["eps1"]
        t_adv = int(bt["ts"][0])
        oh = jax.nn.one_hot(jnp.full((B,), t_adv), T)

        def net_loss_fn(p):
            xs, cs, b, mu, logstd, pre = model.apply(
                {"params": p}, seq_b, seq_b, T, rngs=rngs)
            recon = mse_loss(xs, target)
            kl = kl_loss(mu, logstd)
            loss = RECON_W * recon + gamma * kl
            pred = reg.apply(
                {"params": jax.lax.stop_gradient(params[1])}, mu, oh)
            lr_adv = mse_loss(pred, seq_b[:, t_adv])
            loss = loss - jnp.clip(lr_adv, max=0.45) * W_REG
            loss = loss - jnp.clip(lr_adv, max=0.7) * W_REG
            return loss, (recon, kl, mu)

        (loss, (recon, kl, mu)), g = jax.value_and_grad(
            net_loss_fn, has_aux=True)(params[0])
        u, opts[0] = txs[0].update(g, opts[0], params[0])
        params[0] = optax.apply_updates(params[0], u)
        # the shipped step's reference-faithful imax quirk: the very
        # first step sees imax=0 (reference initializes self.imax = 0
        # and the hook only sets it after iteration 1)
        imax_t = 0.0 if n == 0 else IMAX
        gamma = float(schedules.update_gamma(
            jnp.asarray(gamma), kl, imax_t, GAMMA_STEP))
        mu_sg = jax.lax.stop_gradient(mu)
        for i in range(5):
            t = int(bt["ts"][i])
            ohi = jax.nn.one_hot(jnp.full((B,), t), T)
            tgt = seq_b[:, t]

            def reg_loss_fn(rp):
                return mse_loss(reg.apply({"params": rp}, mu_sg, ohi), tgt)

            _, rg = jax.value_and_grad(reg_loss_fn)(params[1])
            u, opts[1] = txs[1].update(rg, opts[1], params[1])
            params[1] = optax.apply_updates(params[1], u)
        m_ours.append(dict(recon=float(recon), kl=float(kl),
                           loss=float(loss), gamma=gamma))

    # quantified bound, not exactness: the 1-batch regressor lag and the
    # independent adversarial index perturb the loss by O(w_reg * clamp)
    for key in ("recon", "kl", "loss", "gamma"):
        rel = _traj_max_rel(m_ref, m_ours, key)
        assert rel < 0.05, (
            f"shipped-step '{key}' drifted {rel:.2e} from the reference "
            "trajectory — beyond the documented reorder's expected scale")


# ===================================================================== cvbae
# VUNet-alter (cvbae) gradient lockstep: the shipped make_cvbae_train_step
# vs the reference train_fn body (shape_and_pose_net.py:360-466) — the
# second training family, exercising weight-norm CONV backward through the
# full eu/ed/du/dd stack, compute_kl_with_prior's gradient, the cvbae gamma
# controller, Adam(0.5, 0.9) and the per-iteration linear lr decay.
#
# The perceptual net is a deterministic avg-pool pyramid implemented
# identically on both sides (torchvision's VGG weights don't exist in this
# image; the vgg_loss ALGEBRA itself is parity-tested in
# test_reference_parity.py::test_living_reference_losses_match).
# train_regressor=False: the cvbae regressor is gradient-inert for the
# vunet (reference computes its latents under no_grad) and its own
# training is the same Adam-on-MLP algebra the behavior lockstep covers.

VB, VS, NF0, NFM = 4, 32, 8, 16
V_STEPS = 12
V_LR0, V_TOTAL = 5e-4, 1000.0
V_GAMMA_STEP, V_IMAX, V_GAMMA0 = 1e-3, 0.5, 0.02
V_NINIT = 1


def _gen_vbatches(model, variables, seed=1):
    """Batches + per-shape eps draws (one per latent scale per step)."""
    # latent shapes from one traced apply with a recording stub
    shapes = []
    orig = jax.random.normal

    def record(key, shape=(), dtype=jnp.float32):
        shapes.append(tuple(shape))
        return jnp.zeros(shape, dtype)

    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(VB, VS, VS, 3), jnp.float32)
    jax.random.normal = record
    try:
        model.apply(variables, x, x, rngs={"sample": jax.random.PRNGKey(0)},
                    train=False)
    finally:
        jax.random.normal = orig
    out = []
    for _ in range(V_STEPS):
        out.append(dict(
            pose=rng.randn(VB, VS, VS, 3).astype(np.float32) * 0.5,
            stick=rng.randn(VB, VS, VS, 3).astype(np.float32) * 0.5,
            eps={s: rng.randn(*s).astype(np.float32) for s in shapes},
        ))
    return out


class _ShapeEps:
    """jax.random.normal replacement: return the pre-generated eps for the
    requested shape (set per step)."""

    def __init__(self):
        self.table = {}

    def __call__(self, key, shape=(), dtype=jnp.float32):
        return jnp.asarray(self.table[tuple(shape)], dtype)


def _fake_losses_import(ref, monkeypatch):
    import types

    def fake(name, **attrs):
        if name in sys.modules:
            return
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        monkeypatch.setitem(sys.modules, name, mod)

    fake("kornia")
    fake("torchvision")
    fake("torchvision.utils", make_grid=lambda *a, **k: None)
    fake("ignite")
    fake("ignite.metrics", Average=object)
    fake("ignite.engine", Events=object)
    import lib.losses as ref_losses
    return ref_losses


_VGG_NAMES = ("relu1_2", "relu2_2", "relu3_2", "relu4_2", "relu5_2")


def test_cvbae_lockstep_training_parity(ref, monkeypatch):
    torch = ref["torch"]
    import flax.linen as fnn
    import models.vunets as ref_vunets
    from behavior_driven_video_synthesis_tpu.models.convert import (
        convert_vunet_alter,
        vunet_alter_reference_state_dict,
    )
    from behavior_driven_video_synthesis_tpu.models.vunet import VUNet
    from behavior_driven_video_synthesis_tpu.train.vunet_exp import (
        create_vunet_state,
        make_cvbae_train_step,
    )
    from behavior_driven_video_synthesis_tpu.core.config import Config

    ref_losses = _fake_losses_import(ref, monkeypatch)

    class FakePyramid(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            feats = {"input": x}
            h = x
            for name in _VGG_NAMES:
                h = fnn.avg_pool(h, (2, 2), (2, 2))
                feats[name] = h
            return feats

    class FakeVGGTorch(torch.nn.Module):
        loss_weights = [1.0] * 6

        def forward(self, x):
            d = {"input": x}
            h = x
            for name in _VGG_NAMES:
                h = torch.nn.functional.avg_pool2d(h, 2)
                d[name] = h
            return d

    model = VUNet(spatial_size=VS, nf_start=NF0, nf_max=NFM,
                  variant="alter", dropout_prob=0.0, dtype=jnp.float32)
    vgg = FakePyramid()
    config = Config({
        "architecture": {"cvae": False},
        "training": {"ll_weight": 1.0, "vgg_weights": [1.0] * 6,
                     "train_regressor": False,
                     "gamma_step": V_GAMMA_STEP,
                     "information_max": V_IMAX,
                     "n_init_batches": V_NINIT,
                     "dropout_rng": "threefry"},
    })
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((VB, VS, VS, 3), jnp.float32)
    init_vars = model.init({"params": key, "sample": key}, x0, x0)
    batches = _gen_vbatches(model, init_vars)

    # ------------------------------------------------------- torch reference
    sd0 = vunet_alter_reference_state_dict(
        init_vars, n_scales=model.n_scales, n_scales_x=model.n_scales_x)
    refm = ref_vunets.VunetAlter(
        n_channels_x=3, spatial_size=VS, n_scales=0, bottleneck_factor=2,
        box_factor=2, n_latent_scales=2, conv_layer_type="l1",
        nf_start=NF0, nf_max=NFM, subpixel_upsampling=True,
        dropout_prob=0.0)
    refm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
         for k, v in sd0.items()}, strict=True)
    refm.train()
    fake_vgg = FakeVGGTorch()
    opt = _DataOpt(torch, refm.parameters(), V_LR0, "adam",
                   betas=(0.5, 0.9))
    eps_nchw = {"cur": None}
    orig_randn_like = torch.randn_like

    def patched_randn_like(t, **kw):
        arr = eps_nchw["cur"][tuple(t.shape)]
        return torch.from_numpy(arr)

    torch.randn_like = patched_randn_like
    gamma = V_GAMMA0
    m_ref = []
    try:
        for n, bt in enumerate(batches):
            opt.lr = V_LR0 * max(0.0, 1.0 - n / V_TOTAL)
            eps_nchw["cur"] = {
                (s[0], s[3], s[1], s[2]):
                    np.transpose(e, (0, 3, 1, 2)).copy()
                for s, e in bt["eps"].items()}
            pose = torch.from_numpy(
                np.transpose(bt["pose"], (0, 3, 1, 2)).copy())
            stick = torch.from_numpy(
                np.transpose(bt["stick"], (0, 3, 1, 2)).copy())
            out_img, means, logstds, _ = refm(pose, stick)
            ll_dict = ref_losses.vgg_loss(fake_vgg, pose, out_img)
            likelihood = 1.0 * torch.sum(torch.stack(
                [ll_dict[k] for k in ll_dict], dim=0))
            kl = ref_losses.compute_kl_with_prior(means, logstds)
            loss = likelihood
            # reference gate: ignite iterations are 1-based
            if (n + 1) > V_NINIT:
                loss = loss + torch.tensor(gamma) * kl
            opt.zero_grad()
            loss.backward()
            opt.step()
            gamma = max(gamma - V_GAMMA_STEP * (V_IMAX - kl.item()), 0)
            m_ref.append(dict(loss=loss.item(), ll=likelihood.item(),
                              kl=kl.item(), gamma=gamma))
    finally:
        torch.randn_like = orig_randn_like
    final_sd = {k: v.detach().numpy().copy()
                for k, v in refm.state_dict().items()}

    # ------------------------------------------------------------- our side
    import optax as _optax
    txs = {"vunet": _optax.adam(
        _optax.linear_schedule(V_LR0, 0.0, int(V_TOTAL)),
        b1=0.5, b2=0.9)}
    vgg_vars = vgg.init(key, x0)
    batch0 = {"pose_img": x0, "stickman": x0, "app_img": x0}
    state = create_vunet_state(key, model, None, vgg, txs, batch0,
                               gamma_init=V_GAMMA0)
    state = state.replace(vunet=state.vunet.replace(
        params=init_vars["params"]))
    step_fn = make_cvbae_train_step(model, None, vgg, vgg_vars, txs, config)

    eps = _ShapeEps()
    monkeypatch.setattr(jax.random, "normal", eps)
    m_ours = []
    for bt in batches:
        eps.table = bt["eps"]
        batch = {"pose_img": jnp.asarray(bt["pose"]),
                 "stickman": jnp.asarray(bt["stick"])}
        batch["app_img"] = batch["pose_img"]
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(5))
        m_ours.append(dict(loss=float(metrics["loss"]),
                           ll=float(metrics["likelihood_loss"]),
                           kl=float(metrics["kl_loss"]),
                           gamma=float(metrics["gamma"])))

    for keyname in ("loss", "ll", "kl", "gamma"):
        rel = _traj_max_rel(m_ref, m_ours, keyname)
        assert rel < 5e-3, (
            f"cvbae '{keyname}' trajectory diverged (max rel {rel:.2e}); "
            f"ref={[m[keyname] for m in m_ref[:4]]} "
            f"ours={[m[keyname] for m in m_ours[:4]]}")

    # final params: ||ours - ref|| / ||ref - init|| over the whole vunet
    ref_final = convert_vunet_alter(
        final_sd, n_scales=model.n_scales,
        n_scales_x=model.n_scales_x)["params"]
    flat = lambda t: jnp.concatenate(
        [jnp.ravel(l) for l in jax.tree_util.tree_leaves(t)])
    move = float(jnp.linalg.norm(
        flat(ref_final) - flat(init_vars["params"]))) + 1e-8
    err = float(jnp.linalg.norm(
        flat(state.vunet.params) - flat(ref_final))) / move
    assert err < 2e-2, (
        f"cvbae final vunet params off by {err:.2e} of training movement")


# ====================================================================== flow
# Flow-stage gradient lockstep (the third training family): N Adam steps
# of the latent flow on fixed behavior latents, reference only_flow body
# (experiments/behavior_net.py:704-714: gauss, logdet = latent_flow(b);
# FlowLoss; Adam(flow_lr*batch, betas=(0.5,0.9), weight_decay=cfg)).
# Exercises ActNorm/affine-coupling/shuffle BACKWARD + the flow optimizer
# semantics (torch-Adam L2-in-grad wd, the one reference optimizer that
# actually uses weight_decay).

F_B, F_C, F_NFLOWS = 16, 32, 4
F_STEPS = 15
F_LR, F_WD = 1e-3, 1e-5


def test_flow_lockstep_training_parity(ref, monkeypatch):
    torch = ref["torch"]
    import models.flow.simple_flow as sf
    from behavior_driven_video_synthesis_tpu.models.convert import (
        convert_latent_flow,
    )
    from behavior_driven_video_synthesis_tpu.models.flows import (
        LatentFlow,
        flow_loss,
    )

    ref_losses = _fake_losses_import(ref, monkeypatch)

    torch.manual_seed(0)
    refm = sf.UnsupervisedTransformer2(
        flow_in_channels=F_C, flow_mid_channels=2 * F_C,
        flow_hidden_depth=2, n_flows=F_NFLOWS)
    rng = np.random.RandomState(3)
    with torch.no_grad():  # data-dependent ActNorm init
        refm(torch.from_numpy(rng.randn(64, F_C).astype(np.float32)))
    sd0 = {k: v.detach().numpy().copy()
           for k, v in refm.state_dict().items()}
    batches = [rng.randn(F_B, F_C).astype(np.float32)
               for _ in range(F_STEPS)]

    floss = ref_losses.FlowLoss()
    opt = _DataOpt(torch, refm.parameters(), F_LR, "adam",
                   weight_decay=F_WD, betas=(0.5, 0.9))
    m_ref = []
    for b in batches:
        z, logdet = refm(torch.from_numpy(b))
        # reference only_flow passes the (B, C, 1, 1) flow output into
        # FlowLoss unsqueezed (behavior_net.py:705-706)
        loss, _log = floss(z, logdet)
        opt.zero_grad()
        loss.backward()
        opt.step()
        m_ref.append(dict(loss=loss.item()))
    final_sd = {k: v.detach().numpy().copy()
                for k, v in refm.state_dict().items()}

    flow = LatentFlow(flow_in_channels=F_C, flow_mid_channels=2 * F_C,
                      n_flows=F_NFLOWS)
    variables = convert_latent_flow(sd0, F_NFLOWS)
    params, buffers = variables["params"], variables["buffers"]
    tx = torch_adam(F_LR, b1=0.5, b2=0.9, weight_decay=F_WD)
    opt_state = tx.init(params)
    m_ours = []
    for b in batches:
        def loss_fn(p):
            z, logdet = flow.apply({"params": p, "buffers": buffers},
                                   jnp.asarray(b))
            return flow_loss(z, logdet)

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, u)
        m_ours.append(dict(loss=float(loss)))

    rel = _traj_max_rel(m_ref, m_ours, "loss")
    assert rel < 2e-3, (
        f"flow loss trajectory diverged (max rel {rel:.2e}); "
        f"ref={[m['loss'] for m in m_ref[:5]]} "
        f"ours={[m['loss'] for m in m_ours[:5]]}")

    ref_final = convert_latent_flow(final_sd, F_NFLOWS)["params"]
    init_p = convert_latent_flow(sd0, F_NFLOWS)["params"]
    flat = lambda t: jnp.concatenate(
        [jnp.ravel(l) for l in jax.tree_util.tree_leaves(t)])
    move = float(jnp.linalg.norm(flat(ref_final) - flat(init_p))) + 1e-8
    err = float(jnp.linalg.norm(flat(params) - flat(ref_final))) / move
    assert err < 2e-2, (
        f"flow final params off by {err:.2e} of training movement")


# ===================================================================== mtvae
# MTVAE gradient lockstep (the fourth and final training family): the
# SHIPPED make_mtvae_train_step vs the reference train_fn body
# (experiments/mt_vae.py:296-336) — L1 recon + ramped KL + velocity-motion
# + cycle losses, random initial LSTM states, torch Adam(lr_init, wd).
# Round-5 drift this lockstep confirms fixed: k_vel 8 / weight_motion 10 /
# weight_cycle 10 (config/mt_vae.yaml:32-34), the 1-based kl ramp, and
# torch-Adam L2 weight decay.

M_B, M_T, M_K = 3, 20, 12
M_STEPS = 8
M_TOTAL = 500.0


def test_mtvae_lockstep_training_parity(ref, monkeypatch):
    torch = ref["torch"]
    from behavior_driven_video_synthesis_tpu.core.config import Config
    from behavior_driven_video_synthesis_tpu.models.convert import (
        convert_mtvae,
    )
    from behavior_driven_video_synthesis_tpu.models.mtvae import MTVAE
    from behavior_driven_video_synthesis_tpu.train.mtvae_exp import (
        create_mtvae_state,
        make_mtvae_train_step,
    )
    from behavior_driven_video_synthesis_tpu.train.losses import l1_loss

    ref_losses = _fake_losses_import(ref, monkeypatch)

    torch.manual_seed(0)
    refm = ref["rbn"].MTVAE({"n_cond": 10}, M_K, "cpu")
    sd0 = {k: v.detach().numpy().copy()
           for k, v in refm.state_dict().items()}
    rng = np.random.RandomState(5)
    batches = []
    for _ in range(M_STEPS):
        batches.append(dict(
            kps=(rng.randn(M_B, M_T, M_K) * 0.5).astype(np.float32),
            cross=(rng.randn(M_B, M_T, M_K) * 0.5).astype(np.float32),
            # draw order per step on both sides: h0, c0 (B,1024);
            # eps_z, eps_cycle, ps (B,512)
            big=[rng.randn(M_B, 1024).astype(np.float32)
                 for _ in range(2)],
            small=[rng.randn(M_B, 512).astype(np.float32)
                   for _ in range(3)],
        ))

    # ------------------------------------------------------- torch reference
    queues = {}
    orig_randn, orig_randn_like = torch.randn, torch.randn_like

    def fake_randn(*size, **kw):
        shape = tuple(size[0]) if len(size) == 1 and isinstance(
            size[0], (tuple, list)) else tuple(size)
        flat = tuple(s for s in shape if s != 1)
        return torch.from_numpy(queues[flat].pop(0)).reshape(shape)

    def fake_randn_like(t, **kw):
        flat = tuple(s for s in tuple(t.shape) if s != 1)
        return torch.from_numpy(queues[flat].pop(0)).reshape(t.shape)

    torch.randn, torch.randn_like = fake_randn, fake_randn_like
    opt = _DataOpt(torch, refm.parameters(), 1e-4, "adam",
                   weight_decay=1e-12)
    k_vel, w_motion, w_cycle = 8, 10.0, 10.0
    m_ref = []
    try:
        for n, bt in enumerate(batches):
            queues[(M_B, 1024)] = list(bt["big"])
            queues[(M_B, 512)] = list(bt["small"])
            kps = torch.from_numpy(bt["kps"])
            cross = torch.from_numpy(bt["cross"])
            out_seq, mu, logstd, out_cycle = refm(kps, cross)
            ps = torch.randn_like(out_cycle)
            cycle_loss = torch.mean(torch.abs(out_cycle - ps))
            kps_loss = torch.mean(torch.abs(out_seq - kps[:, refm.div:]))
            l_kl = ref_losses.kl_loss(mu, logstd)
            vel_tgt = (kps[:, refm.div:refm.div + k_vel]
                       - kps[:, refm.div - 1:refm.div + k_vel - 1])
            vel_pred = out_seq[:, :k_vel] - torch.cat(
                [kps[:, refm.div - 1].unsqueeze(1),
                 out_seq[:, :k_vel - 1]], dim=1)
            motion_loss = torch.mean(torch.abs(vel_tgt - vel_pred))
            kl_weight = 1e-5 + (1 - 1e-5) * min((n + 1) / M_TOTAL, 1.0)
            loss = (kps_loss + kl_weight * l_kl + w_motion * motion_loss
                    + w_cycle * cycle_loss)
            opt.zero_grad()
            loss.backward()
            opt.step()
            m_ref.append(dict(loss=loss.item(), rec=kps_loss.item(),
                              kl=l_kl.item(), motion=motion_loss.item(),
                              cycle=cycle_loss.item()))
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_randn_like
    final_sd = {k: v.detach().numpy().copy()
                for k, v in refm.state_dict().items()}

    # ------------------------------------------------------------- our side
    model = MTVAE(n_in=M_K, n_cond=10)
    config = Config({"architecture": {}, "training": {
        "k_vel": k_vel, "weight_motion": w_motion,
        "weight_cycle": w_cycle}})
    tx = torch_adam(1e-4, weight_decay=1e-12)
    jq = {}

    def fake_normal(key, shape=(), dtype=jnp.float32):
        return jnp.asarray(jq[tuple(shape)].pop(0), dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    step_fn = make_mtvae_train_step(model, tx, config, int(M_TOTAL))
    batch0 = {"keypoints": jnp.asarray(batches[0]["kps"]),
              "paired_keypoints": jnp.asarray(batches[0]["cross"])}
    jq[(M_B, 1024)] = list(batches[0]["big"])
    jq[(M_B, 512)] = list(batches[0]["small"])
    state = create_mtvae_state(jax.random.PRNGKey(0), model, tx, batch0)
    state = state.replace(net=state.net.replace(
        params=convert_mtvae(sd0)["params"]))
    m_ours = []
    for bt in batches:
        jq[(M_B, 1024)] = list(bt["big"])
        jq[(M_B, 512)] = list(bt["small"])
        batch = {"keypoints": jnp.asarray(bt["kps"]),
                 "paired_keypoints": jnp.asarray(bt["cross"])}
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(9))
        m_ours.append(dict(loss=float(metrics["loss"]),
                           rec=float(metrics["rec_loss"]),
                           kl=float(metrics["kl_loss"]),
                           motion=float(metrics["motion_loss"]),
                           cycle=float(metrics["cycle_loss"])))

    for keyname in ("loss", "rec", "kl", "motion", "cycle"):
        rel = _traj_max_rel(m_ref, m_ours, keyname)
        assert rel < 5e-3, (
            f"mtvae '{keyname}' trajectory diverged (max rel {rel:.2e}); "
            f"ref={[m[keyname] for m in m_ref[:4]]} "
            f"ours={[m[keyname] for m in m_ours[:4]]}")

    ref_final = convert_mtvae(final_sd)["params"]
    init_p = convert_mtvae(sd0)["params"]
    flat = lambda t: jnp.concatenate(
        [jnp.ravel(l) for l in jax.tree_util.tree_leaves(t)])
    move = float(jnp.linalg.norm(flat(ref_final) - flat(init_p))) + 1e-8
    err = float(jnp.linalg.norm(
        flat(state.net.params["params"]
             if "params" in state.net.params else state.net.params)
        - flat(ref_final))) / move
    assert err < 2e-2, (
        f"mtvae final params off by {err:.2e} of training movement")
