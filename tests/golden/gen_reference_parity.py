"""Generate tests/golden/reference_parity.npz from the LIVING reference.

Runs the actual reference implementation (/root/reference, imported in
place, torch CPU) on seeded random weights + inputs and records
{state dicts, inputs, outputs} so tests/test_reference_parity.py can assert
our JAX stack against the reference itself — and keep doing so from the
committed goldens in environments without torch or without /root/reference.

Usage (from the repo root, with torch + /root/reference present):

    python tests/golden/gen_reference_parity.py

Determinism shims applied while generating (documented divergence points):
  * ``torch.Tensor.get_device`` returns the device object (the reference
    passes its -1 CPU result back into ``.to(device)`` —
    pose_behavior_rnn.py:595,612 — which only works on CUDA).
  * ``torch.randn_like`` returns zeros during forward passes, collapsing
    every reparametrized sample onto its mean (vunets.py:151-156,596;
    pose_behavior_rnn.py:204-210) so outputs are deterministic on both
    sides.  The JAX tests patch ``jax.random.normal`` the same way.
"""
import os
import sys
from contextlib import contextmanager

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REF_ROOT = os.environ.get("BDVS_REFERENCE_ROOT", "/root/reference")
OUT = os.path.join(HERE, "reference_parity.npz")

sys.path.insert(0, REPO)
sys.path.insert(0, REF_ROOT)

import torch  # noqa: E402

torch.Tensor.get_device = lambda self: self.device  # CPU shim (see above)

from models.pose_behavior_rnn import ResidualBehaviorNet  # noqa: E402
from models.flow.simple_flow import UnsupervisedTransformer2  # noqa: E402
from models import vunets as ref_vunets  # noqa: E402


@contextmanager
def eps_zero():
    orig = torch.randn_like
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    try:
        yield
    finally:
        torch.randn_like = orig


@contextmanager
def randn_zero():
    """Zero out torch.randn too — the MTVAE draws its LSTM initial states
    with torch.randn, not randn_like (pose_behavior_rnn.py:286-287)."""
    orig = torch.randn
    torch.randn = lambda *size, **kw: torch.zeros(
        *(size[0] if len(size) == 1 and isinstance(size[0], tuple) else size))
    try:
        yield
    finally:
        torch.randn = orig


def _store_sd(store, case, module):
    for k, v in module.state_dict().items():
        store[f"{case}/sd/{k}"] = v.detach().numpy()


def gen_behavior(store):
    """ResidualBehaviorNet full forward (pose_behavior_rnn.py:574-626)."""
    K, H, B, T = 12, 16, 3, 6
    torch.manual_seed(10)
    ref = ResidualBehaviorNet(n_kps=K, dim_hidden_b=H,
                              information_bottleneck=True)
    ref.eval()
    g = torch.Generator().manual_seed(11)
    x1 = torch.randn(B, T, K, generator=g)
    x2 = torch.randn(B, T, K, generator=g)
    with torch.no_grad(), eps_zero():
        xs, cs, _zs, b, mu, logstd, pre = ref(x1, x2, T, start_frame=0,
                                              sample=False)
    assert torch.equal(b, mu)  # eps = 0 collapses b onto mu
    _store_sd(store, "rbn", ref)
    store["rbn/in/x1"] = x1.numpy()
    store["rbn/in/x2"] = x2.numpy()
    store["rbn/meta/length"] = np.array(T)
    for name, t in (("xs", xs), ("cs", cs), ("mu", mu), ("logstd", logstd),
                    ("pre", pre)):
        store[f"rbn/out/{name}"] = t.numpy()


def gen_flow(store, case, C, n_flows, seed):
    """UnsupervisedTransformer2 (simple_flow.py:136-180) fwd/logdet/reverse.

    ActNorm is data-dependent-initialized on a first batch before
    recording, exactly as a reference training run would leave it."""
    torch.manual_seed(seed)
    ut2 = UnsupervisedTransformer2(flow_in_channels=C, flow_mid_channels=24,
                                   flow_hidden_depth=2, n_flows=n_flows)
    ut2.eval()
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        ut2(torch.randn(32, C, generator=g))  # trigger ActNorm init
        x = torch.randn(4, C, generator=g)
        z, logdet = ut2(x)
        z = z.squeeze(-1).squeeze(-1)
        back = ut2.reverse(z).squeeze(-1).squeeze(-1)
    _store_sd(store, case, ut2)
    store[f"{case}/in/x"] = x.numpy()
    store[f"{case}/out/z"] = z.numpy()
    store[f"{case}/out/logdet"] = logdet.numpy()
    # the reference's own reverse — exact inverse at even C, known-broken at
    # odd C (DoubleVectorCouplingBlock2 reverse re-chunks ceil/floor after
    # the swap, blocks.py:312-320); recorded to document the divergence.
    store[f"{case}/out/ref_reverse"] = back.numpy()


def gen_modules(store):
    """lib/modules.py primitives: NormConv2d (:120-145), VunetRNB
    (:185-236), ActNorm (:260-331), Downsample/Upsample (:148-183)."""
    from lib.modules import (NormConv2d, VunetRNB, ActNorm, Downsample,
                             Upsample)
    g = torch.Generator().manual_seed(21)

    torch.manual_seed(20)
    conv = NormConv2d(5, 7, kernel_size=3, stride=1, padding=1)
    conv.eval()
    x = torch.randn(2, 5, 8, 8, generator=g)
    with torch.no_grad():
        y = conv(x)
    _store_sd(store, "normconv3", conv)
    store["normconv3/in/x"] = x.numpy()
    store["normconv3/out/y"] = y.numpy()

    torch.manual_seed(22)
    rnb = VunetRNB(channels=6, a_channels=4, residual=True)
    rnb.eval()
    x = torch.randn(2, 6, 8, 8, generator=g)
    a = torch.randn(2, 4, 8, 8, generator=g)
    with torch.no_grad():
        y = rnb(x, a)
    _store_sd(store, "rnb_res", rnb)
    store["rnb_res/in/x"] = x.numpy()
    store["rnb_res/in/a"] = a.numpy()
    store["rnb_res/out/y"] = y.numpy()

    torch.manual_seed(23)
    rnb2 = VunetRNB(channels=6)
    rnb2.eval()
    x = torch.randn(2, 6, 8, 8, generator=g)
    with torch.no_grad():
        y = rnb2(x)
    _store_sd(store, "rnb_plain", rnb2)
    store["rnb_plain/in/x"] = x.numpy()
    store["rnb_plain/out/y"] = y.numpy()

    torch.manual_seed(24)
    an = ActNorm(9, logdet=True)
    xinit = torch.randn(16, 9, generator=g)
    x = torch.randn(4, 9, generator=g)
    with torch.no_grad():
        an(xinit)  # data-dependent init
        y, ld = an(x)
    _store_sd(store, "actnorm", an)
    store["actnorm/in/x"] = x.numpy()
    store["actnorm/out/y"] = y.numpy()
    store["actnorm/out/logdet"] = ld.numpy()

    torch.manual_seed(25)
    down = Downsample(6, 10)
    down.eval()
    x = torch.randn(2, 6, 8, 8, generator=g)
    with torch.no_grad():
        y = down(x)
    _store_sd(store, "down", down)
    store["down/in/x"] = x.numpy()
    store["down/out/y"] = y.numpy()

    torch.manual_seed(26)
    up = Upsample(6, 5, subpixel=True)
    up.eval()
    x = torch.randn(2, 6, 8, 8, generator=g)
    with torch.no_grad():
        y = up(x)
    _store_sd(store, "up_subpixel", up)
    store["up_subpixel/in/x"] = x.numpy()
    store["up_subpixel/out/y"] = y.numpy()


def gen_vunet(store, case, cls, seed):
    """VunetOrg (vunets.py:18-106) / VunetAlter (:426-517) forward +
    transfer at a small runnable config, eps = 0."""
    torch.manual_seed(seed)
    ref = cls(n_channels_x=3, spatial_size=32, n_scales=0,
              bottleneck_factor=2, box_factor=2, n_latent_scales=2,
              conv_layer_type="l1", nf_start=8, nf_max=16,
              subpixel_upsampling=True, dropout_prob=0.0)
    ref.eval()
    g = torch.Generator().manual_seed(seed + 1)
    x = torch.randn(2, 3, 32, 32, generator=g)
    c = torch.randn(2, 3, 32, 32, generator=g)
    with torch.no_grad(), eps_zero():
        if cls is ref_vunets.VunetOrg:
            imgs, qs, ps, _acts = ref(x, c)
            for i, p in enumerate(ps):
                store[f"{case}/out/p{i}"] = p.numpy()
        else:
            imgs, qs, logstds, _acts = ref(x, c)
            for i, s in enumerate(logstds):
                store[f"{case}/out/logstd{i}"] = s.numpy()
        t_imgs = ref.transfer(x, c)
    _store_sd(store, case, ref)
    store[f"{case}/in/x"] = x.numpy()
    store[f"{case}/in/c"] = c.numpy()
    store[f"{case}/out/imgs"] = imgs.numpy()
    for i, q in enumerate(qs):
        store[f"{case}/out/q{i}"] = q.numpy()
    store[f"{case}/out/transfer"] = t_imgs.numpy()


def gen_mtvae(store):
    """Reference MTVAE forward, recon + transfer paths
    (pose_behavior_rnn.py:279-341).  The state dict is SYNTHESIZED from a
    seed (tests/ref_sd_synth.py) — the reference hard-codes 1024/512 hidden
    sizes, so recording it would add ~80 MB to the committed golden; only
    inputs/outputs are stored.  torch.randn (LSTM init states) and
    torch.randn_like (reparam eps) are both zeroed."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from ref_sd_synth import mtvae_state_dict
    from models.pose_behavior_rnn import MTVAE as RefMTVAE

    K, B, T, n_cond = 8, 2, 16, 6
    ref = RefMTVAE({"n_cond": n_cond}, K, "cpu")
    sd = mtvae_state_dict(K, seed=50)
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                        strict=True)
    ref.eval()
    g = torch.Generator().manual_seed(51)
    src = torch.randn(B, T, K, generator=g)
    tgt = torch.randn(B, T, K, generator=g)
    with torch.no_grad(), eps_zero(), randn_zero():
        out_kp, mu, logstd, out_cycle = ref(src, tgt)
        out_tr, mu_tr, _, cycle_tr = ref(src, tgt, transfer=True)
    store["mtvae/in/src"] = src.numpy()
    store["mtvae/in/tgt"] = tgt.numpy()
    store["mtvae/meta/n_cond"] = np.array(n_cond)
    store["mtvae/meta/sd_seed"] = np.array(50)
    for name, t in (("out_kp", out_kp), ("mu", mu), ("logstd", logstd),
                    ("out_cycle", out_cycle), ("out_tr", out_tr),
                    ("mu_tr", mu_tr), ("cycle_tr", cycle_tr)):
        store[f"mtvae/out/{name}"] = t.numpy()


def gen_disc_michael(store):
    """Sequence_disc_michael — the velocity-based action classifier behind
    the CF transfer scores (pose_discriminator.py:284-360;
    experiments/behavior_net.py:296).  T=50 matches the reference's
    hard-coded fc input size 13*32 (:299)."""
    from models.pose_discriminator import Sequence_disc_michael

    torch.manual_seed(60)
    n_kps, B, T, n_actions = 8, 3, 50, 15
    ref = Sequence_disc_michael([2, 1, 1, 1], n_kps, out_dim=n_actions)
    ref.eval()
    g = torch.Generator().manual_seed(61)
    x = torch.randn(B, n_kps, T, generator=g)
    with torch.no_grad():
        logits, fmap = ref(x)
    _store_sd(store, "disc_michael", ref)
    store["disc_michael/in/x"] = x.numpy()
    store["disc_michael/out/logits"] = logits.numpy()
    store["disc_michael/out/fmap"] = fmap.numpy()


def main():
    store = {}
    gen_behavior(store)
    gen_flow(store, "flow_even", C=10, n_flows=3, seed=30)
    gen_flow(store, "flow_odd", C=11, n_flows=2, seed=31)
    gen_modules(store)
    gen_vunet(store, "vunet_org", ref_vunets.VunetOrg, seed=40)
    gen_vunet(store, "vunet_alter", ref_vunets.VunetAlter, seed=41)
    gen_mtvae(store)
    gen_disc_michael(store)
    np.savez_compressed(OUT, **store)
    size = os.path.getsize(OUT)
    print(f"wrote {OUT}: {len(store)} arrays, {size / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
