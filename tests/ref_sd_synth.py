"""Deterministic synthesized state dicts for parity fixtures.

The reference MTVAE (pose_behavior_rnn.py:241-358) hard-codes hidden sizes
1024/512, so a recorded state dict would be ~80 MB — too large to commit.
Instead both the golden generator (tests/golden/gen_reference_parity.py)
and the parity tests synthesize the SAME torch-layout state dict from a
seed with numpy's frozen legacy RandomState, and only the (tiny)
inputs/outputs are committed.

Weights are uniform(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch's default
Linear/LSTM init range — so activations stay O(1)."""
import numpy as np

MTVAE_DIM = 1024   # reference hard-codes these (pose_behavior_rnn.py:252-275)
MTVAE_Z = 512


def _lin(rs, out_dim, in_dim, prefix, sd):
    k = 1.0 / np.sqrt(in_dim)
    sd[f"{prefix}.weight"] = rs.uniform(-k, k, (out_dim, in_dim)).astype(
        np.float32)
    sd[f"{prefix}.bias"] = rs.uniform(-k, k, (out_dim,)).astype(np.float32)


def _lstm(rs, hidden, in_dim, prefix, sd):
    k = 1.0 / np.sqrt(hidden)
    sd[f"{prefix}.weight_ih_l0"] = rs.uniform(
        -k, k, (4 * hidden, in_dim)).astype(np.float32)
    sd[f"{prefix}.weight_hh_l0"] = rs.uniform(
        -k, k, (4 * hidden, hidden)).astype(np.float32)
    sd[f"{prefix}.bias_ih_l0"] = rs.uniform(
        -k, k, (4 * hidden,)).astype(np.float32)
    sd[f"{prefix}.bias_hh_l0"] = rs.uniform(
        -k, k, (4 * hidden,)).astype(np.float32)


def _fc_resnet(rs, in_dim, out_dim, prefix, sd):
    half = out_dim // 2
    _lin(rs, half, in_dim, f"{prefix}.fc1", sd)
    _lin(rs, half, half, f"{prefix}.fc2", sd)
    _lin(rs, out_dim, half, f"{prefix}.fc3", sd)
    _lin(rs, out_dim, in_dim, f"{prefix}.shortcut", sd)


def mtvae_state_dict(n_in: int, seed: int = 0):
    """Full torch-layout state dict for the reference MTVAE(config, n_in),
    including the two heads its forward never calls (make_mu, cov) so
    ``load_state_dict(strict=True)`` validates the complete key set."""
    rs = np.random.RandomState(seed)
    d, z = MTVAE_DIM, MTVAE_Z
    sd = {}
    _lstm(rs, d, n_in, "lstm_enc", sd)
    _lstm(rs, d, d, "lstm_dec", sd)
    _fc_resnet(rs, d, d, "latent_enc", sd)
    _fc_resnet(rs, d + z, d, "latent_dec", sd)
    _lin(rs, n_in, d, "make_keypoints", sd)
    _lin(rs, z, z, "inv_z", sd)
    _lin(rs, d, 2 * d, "make_h_dec", sd)
    _lin(rs, d, 2 * d, "make_c_dec", sd)
    _lin(rs, z, d, "make_mu", sd)
    _lin(rs, z, d, "cov", sd)
    return sd
