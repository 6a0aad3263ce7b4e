"""MT-VAE baseline (Yan et al.) — comparison model.

Behavioral port of /root/reference/models/pose_behavior_rnn.py:241-358:
LSTM encoder over condition/future/target segments (with RANDOM initial
states, ref :286-287), latent from the difference of final hidden states via
an FCResnet (mu/logstd = split halves), transfer mode swaps in the target
encoding, cycle re-encoding, LSTM decoder initialized from
[h_n ; dec_in] projections.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.recurrent import LSTM
from .probes import FCResnet

Dtype = Any


class MTVAE(nn.Module):
    n_in: int
    n_cond: int = 10
    dim: int = 1024
    z_dim: int = 512
    dtype: Dtype = jnp.float32
    remat_cell: bool = False

    def setup(self):
        self.lstm_enc = LSTM(self.dim, dtype=self.dtype,
                             remat_cell=self.remat_cell)
        self.lstm_dec = LSTM(self.dim, dtype=self.dtype,
                             remat_cell=self.remat_cell)
        self.latent_enc = FCResnet(out_dim=self.dim, dtype=self.dtype)
        self.latent_dec = FCResnet(out_dim=self.dim, dtype=self.dtype)
        self.make_keypoints = nn.Dense(self.n_in, dtype=self.dtype,
                                       param_dtype=jnp.float32)
        self.inv_z = nn.Dense(self.z_dim, dtype=self.dtype,
                              param_dtype=jnp.float32)
        self.make_h_dec = nn.Dense(self.dim, dtype=self.dtype,
                                   param_dtype=jnp.float32)
        self.make_c_dec = nn.Dense(self.dim, dtype=self.dtype,
                                   param_dtype=jnp.float32)
        # the reference declares two further heads (make_mu, cov) that its
        # forward never calls (mt_vae.py setup); we do NOT declare them —
        # linen would create no params for an uncalled submodule anyway,
        # and convert_mtvae synthesizes their keys when exporting

    def _encode(self, seq, h0c0):
        # single-layer LSTM without lengths: hs[:, -1] IS h_n, so skip the
        # (T, B, H) output stacking entirely (return_sequences=False)
        _, (h_n, _) = self.lstm_enc(seq, initial_carry=h0c0,
                                    return_sequences=False)
        return h_n, h_n

    def _latent_params(self, e):
        params = self.latent_enc(e)
        half = params.shape[-1] // 2
        return params[..., :half], params[..., half:]

    def _reparam(self, mu, logstd, key):
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        return mu + jnp.exp(logstd) * eps

    def __call__(self, input_source, input_tgt, transfer: bool = False,
                 sample_prior: bool = False):
        B = input_source.shape[0]
        seq_a = input_source[:, :self.n_cond]
        seq_b = input_source[:, self.n_cond:]
        seq_c = input_tgt

        k_init, k_z, k_cycle = jax.random.split(self.make_rng("sample"), 3)
        h0 = jax.random.normal(k_init, (B, self.dim))
        c0 = jax.random.normal(jax.random.fold_in(k_init, 1), (B, self.dim))

        e_a, hn_a = self._encode(seq_a, (h0, c0))
        e_b, _ = self._encode(seq_b, (h0, c0))
        e_c, hn_c = self._encode(seq_c, (h0, c0))

        mu, logstd = self._latent_params(e_b - e_a)
        if sample_prior:
            z = jax.random.normal(k_z, mu.shape, mu.dtype)
        else:
            z = self._reparam(mu, logstd, k_z)

        inv_z = self.inv_z(z)
        e_ref = e_c if transfer else e_a
        out_latent_dec = self.latent_dec(
            jnp.concatenate([inv_z, e_ref], axis=-1))
        dec_in = out_latent_dec + e_ref
        # non-affine layer norm (no params, so inline math is setup()-safe);
        # eps matches torch nn.LayerNorm's 1e-5 (ref :326)
        mean = jnp.mean(dec_in, axis=-1, keepdims=True)
        var = jnp.var(dec_in, axis=-1, keepdims=True)
        dec_in = (dec_in - mean) * jax.lax.rsqrt(var + 1e-5)

        # cycle consistency re-encoding
        mu_c, logstd_c = self._latent_params(dec_in - e_a)
        out_cycle = self._reparam(mu_c, logstd_c, k_cycle)

        init_h = hn_c if transfer else hn_a
        pre_dec = jnp.concatenate([init_h, dec_in], axis=-1)
        h0_dec = jnp.tanh(self.make_h_dec(pre_dec))
        c0_dec = self.make_c_dec(pre_dec)

        # the reference tiles dec_in over T before the LSTM (tile + T input
        # projections); static_steps feeds the SAME dec_in every step and
        # projects it once — identical math, 1/T the input-projection FLOPs
        T_out = seq_b.shape[1]
        out_dec, _ = self.lstm_dec(dec_in, initial_carry=(h0_dec, c0_dec),
                                   static_steps=T_out)
        out_kp = self.make_keypoints(out_dec)
        return out_kp, mu, logstd, out_cycle
