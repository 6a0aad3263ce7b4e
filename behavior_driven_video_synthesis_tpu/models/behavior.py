"""The behavior cVAE: recurrent encoder + residual autoregressive decoder.

TPU-native re-design of the reference's ``ResidualBehaviorNet``
(/root/reference/models/pose_behavior_rnn.py:125-210, 463-626):

  * ``BehaviorEncoder`` — LSTM over the keypoint sequence; the *final* hidden
    state ``pre`` feeds two weight-norm linear heads for (mu, logstd); the
    behavior latent b is a reparametrized sample (or a pure N(0,1) draw when
    ``sample=True``, matching BEncoder._sample).
  * ``ResidualDecoder`` — autoregressive rollout ``x_{t+1} = x_t +
    Linear(h_t)`` where (h, c) of the LSTM cell are BOTH initialized to b
    (reference :603-612).  Expressed as one `lax.scan` with the recurrent
    matmul as the only per-step MXU op; rollout length is static (per-batch
    bucketed seq_len, mirroring the reference's uniform-per-batch length
    sampling).

All randomness is drawn through linen RNG collections ("sample").
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nn import NormDense
from ..ops.recurrent import LSTM, _uniform_init

Dtype = Any


class BehaviorEncoder(nn.Module):
    """Many-to-one sequence encoder producing the behavior latent."""

    dim_hidden: int
    ib: bool = True  # information bottleneck (mu/logstd heads + reparam)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths: Optional[jnp.ndarray] = None, *,
                 sample: bool = False):
        """x: (B, T, K) keypoint sequence -> b (and distribution params).

        Returns (b, mu, logstd, pre) when ``ib`` else pre.
        """
        _, (pre, _c) = LSTM(self.dim_hidden, dtype=self.dtype,
                            name="rnn")(x, lengths, return_sequences=False)
        if not self.ib:
            return pre
        mu = NormDense(self.dim_hidden, dtype=self.dtype, name="mu_fn")(pre)
        logstd = NormDense(self.dim_hidden, dtype=self.dtype,
                           name="std_fn")(pre)
        eps = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
        if sample:
            b = eps  # prior draw, as in reference BEncoder._sample
        else:
            b = mu + jnp.exp(logstd) * eps
        return b, mu, logstd, pre


class ResidualDecoder(nn.Module):
    """Autoregressive residual rollout from a start pose, seeded by b."""

    n_kps: int
    dim_hidden: int
    rnn_type: str = "lstm"  # "lstm" | "gru"
    use_nin: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, b, x_start, length: int):
        """Roll out ``length`` steps.

        Args:
          b: (B, H) behavior latent — initializes hidden AND cell state.
          x_start: (B, K) start pose.
          length: static rollout length.

        Returns:
          xs: (B, length, K) generated poses.
          cs: (B, length, K) per-step residual bases (the pose fed into each
              step — the reference's "velocities" output, :487-506).
        """
        H, K = self.dim_hidden, self.n_kps
        init = _uniform_init(H)
        n_gates = 4 if self.rnn_type == "lstm" else 3
        w_ih = self.param("w_ih", init, (K, n_gates * H))
        w_hh = self.param("w_hh", init, (H, n_gates * H))
        b_ih = self.param("b_ih", init, (n_gates * H,))
        b_hh = self.param("b_hh", init, (n_gates * H,))
        w_out = self.param("w_out", _uniform_init(H), (H, K))
        b_out = self.param("b_out", _uniform_init(H), (K,))
        if self.use_nin:
            w_nin = self.param("w_nin", _uniform_init(K), (K, K))
            b_nin = self.param("b_nin", _uniform_init(K), (K,))

        dt = self.dtype
        w_ih_c, w_hh_c = w_ih.astype(dt), w_hh.astype(dt)
        bias = (b_ih + b_hh).astype(dt)
        w_out_c, b_out_c = w_out.astype(dt), b_out.astype(dt)

        b = b.astype(dt)
        x0 = x_start.astype(dt)

        if self.rnn_type == "lstm":
            carry0 = (b, b, x0)

            def step(carry, _):
                h, c, x = carry
                inp = x
                if self.use_nin:
                    inp = inp @ w_nin.astype(dt) + b_nin.astype(dt)
                gates = inp @ w_ih_c + h @ w_hh_c + bias
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                x_new = x + (h_new @ w_out_c + b_out_c)
                return (h_new, c_new, x_new), (x_new, x)

        else:  # gru
            carry0 = (b, x0)

            def step(carry, _):
                h, x = carry
                inp = x
                if self.use_nin:
                    inp = inp @ w_nin.astype(dt) + b_nin.astype(dt)
                gi = inp @ w_ih_c + b_ih.astype(dt)
                gh = h @ w_hh_c + b_hh.astype(dt)
                i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
                h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(i_r + h_r)
                z = jax.nn.sigmoid(i_z + h_z)
                n = jnp.tanh(i_n + r * h_n)
                h_new = (1.0 - z) * n + z * h
                x_new = x + (h_new @ w_out_c + b_out_c)
                return (h_new, x_new), (x_new, x)

        _, (xs, cs) = jax.lax.scan(step, carry0, None, length=length)
        return jnp.swapaxes(xs, 0, 1), jnp.swapaxes(cs, 0, 1)


def decoder_rollout_kernel(decoder_params, b, x_start, length: int,
                           use_pallas: bool = True, interpret: bool = False):
    """Run a trained ResidualDecoder's rollout through the Pallas kernel
    (ops/pallas/rollout.py): the entire T-step recurrence in one kernel with
    weights pinned in VMEM.  LSTM decoders only."""
    from ..ops.pallas.rollout import residual_lstm_rollout

    p = decoder_params
    return residual_lstm_rollout(
        b, x_start, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"],
        p["w_out"], p["b_out"], length, use_pallas=use_pallas,
        interpret=interpret)


class ResidualBehaviorNet(nn.Module):
    """Full behavior cVAE (reference pose_behavior_rnn.py:538-626).

    forward: infer b from sequence x1, roll out from x2[:, start_frame].
    """

    n_kps: int
    dim_hidden_b: int = 1024
    decoder_arch: str = "lstm"
    use_nin_dec: bool = False
    information_bottleneck: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.b_enc = BehaviorEncoder(
            dim_hidden=self.dim_hidden_b,
            ib=self.information_bottleneck,
            dtype=self.dtype,
        )
        self.decoder = ResidualDecoder(
            n_kps=self.n_kps,
            dim_hidden=self.dim_hidden_b,
            rnn_type=self.decoder_arch,
            use_nin=self.use_nin_dec,
            dtype=self.dtype,
        )

    def __call__(self, x1, x2, length: int, start_frame: int = 0,
                 sample: bool = False,
                 lengths: Optional[jnp.ndarray] = None):
        """Returns (xs, cs, b, mu, logstd, pre) with ib, else (xs, cs, b)."""
        out = self.b_enc(x1, lengths, sample=sample)
        if self.information_bottleneck:
            b, mu, logstd, pre = out
        else:
            b = out
        xs, cs = self.decoder(b, x2[:, start_frame], length)
        if self.information_bottleneck:
            return xs, cs, b, mu, logstd, pre
        return xs, cs, b

    def infer_b(self, s, sample: bool = False,
                lengths: Optional[jnp.ndarray] = None):
        return self.b_enc(s, lengths, sample=sample)

    def generate_seq(self, b, x_pose, length: int, start_frame: int = 0):
        return self.decoder(b, x_pose[:, start_frame], length)
