"""Recurrent Independent Mechanisms (RIM).

TPU-native re-design of /root/reference/models/rim.py (398 LoC — dead code
in the reference: never imported by an experiment, ported for surface
parity).  Behavior preserved:

  * N independent RNN "units" stepped in lockstep by grouped cells
    (reference GroupLSTMCell/GroupGRUCell, rim.py:35-112) — here a single
    einsum over a (units, din, dout) weight tensor, i.e. one batched MXU
    matmul instead of torch.bmm with permutes;
  * input attention against [x, null] with top-k unit activation
    (rim.py:179-215): inactive units keep their previous state and receive
    zero gradient (reference blocked_grad, rim.py:8-18 — realized here with
    the mask * x + (1-mask) * stop_gradient(x) identity);
  * masked multi-head communication attention between active units with a
    residual connection (rim.py:217-259);
  * a multi-layer, optionally bidirectional sequence wrapper that scans the
    cell over time (rim.py:300-398) — `lax.scan`, so the whole rollout is
    one fused XLA loop instead of a Python loop over timesteps.

Divergences by design: hidden states are explicit arguments (functional
JAX), random initial states draw from an explicit key, and the reference's
GroupGRUCell all-ones weight init (rim.py:88-92, an evident bug — it
comments out the uniform init) is replaced by the same fan-in uniform init
the LSTM cell uses.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _group_init(stdv):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)
    return init


class GroupDense(nn.Module):
    """num_blocks independent Dense layers as one einsum
    (reference GroupLinearLayer, rim.py:21-32)."""

    din: int
    dout: int
    num_blocks: int
    stdv: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, num_blocks, din)
        init = (_group_init(self.stdv) if self.stdv is not None
                else nn.initializers.normal(0.01))
        w = self.param("w", init, (self.num_blocks, self.din, self.dout))
        return jnp.einsum("bnd,ndo->bno", x, w.astype(self.dtype),
                          precision=jax.lax.Precision.DEFAULT)


class GroupLSTMCell(nn.Module):
    """N LSTM cells at once (reference rim.py:35-73)."""

    inp_size: int
    hidden_size: int
    num_units: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, c):
        stdv = 1.0 / float(self.hidden_size) ** 0.5
        pre = (GroupDense(self.inp_size, 4 * self.hidden_size,
                          self.num_units, stdv, self.dtype)(x)
               + GroupDense(self.hidden_size, 4 * self.hidden_size,
                            self.num_units, stdv, self.dtype)(h))
        hs = self.hidden_size
        gates = jax.nn.sigmoid(pre[..., :3 * hs])
        g = jnp.tanh(pre[..., 3 * hs:])
        i, f, o = gates[..., :hs], gates[..., hs:2 * hs], gates[..., 2 * hs:]
        c_t = c * f + i * g
        return o * jnp.tanh(c_t), c_t


class GroupGRUCell(nn.Module):
    """N GRU cells at once (reference rim.py:76-112)."""

    inp_size: int
    hidden_size: int
    num_units: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h):
        stdv = 1.0 / float(self.hidden_size) ** 0.5
        gx = GroupDense(self.inp_size, 3 * self.hidden_size,
                        self.num_units, stdv, self.dtype)(x)
        gh = GroupDense(self.hidden_size, 3 * self.hidden_size,
                        self.num_units, stdv, self.dtype)(h)
        i_r, i_i, i_n = jnp.split(gx, 3, axis=-1)
        h_r, h_i, h_n = jnp.split(gh, 3, axis=-1)
        reset = jax.nn.sigmoid(i_r + h_r)
        inp = jax.nn.sigmoid(i_i + h_i)
        new = jnp.tanh(i_n + reset * h_n)
        return new + inp * (h - new)


def _heads(x, num_heads, head_size):
    """(B, N, heads*size) -> (B, heads, N, size)."""
    b, n = x.shape[:2]
    return x.reshape(b, n, num_heads, head_size).transpose(0, 2, 1, 3)


class RIMCell(nn.Module):
    """One RIM step (reference rim.py:115-290)."""

    input_size: int
    hidden_size: int
    num_units: int
    k: int
    rnn_cell: str = "LSTM"          # LSTM | GRU
    input_key_size: int = 64
    input_value_size: int = 400
    input_query_size: int = 64
    num_input_heads: int = 1
    input_dropout: float = 0.1
    comm_key_size: int = 32
    comm_value_size: int = 100
    comm_query_size: int = 32
    num_comm_heads: int = 4
    comm_dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @property
    def _comm_value_size(self) -> int:
        # reference forces comm value size == hidden size (rim.py:124-126)
        return self.hidden_size

    def setup(self):
        ks, vs = self.input_key_size, self.input_value_size
        self.key_net = nn.Dense(self.num_input_heads * ks, dtype=self.dtype,
                                param_dtype=jnp.float32)
        self.value_net = nn.Dense(self.num_input_heads * vs,
                                  dtype=self.dtype,
                                  param_dtype=jnp.float32)
        if self.rnn_cell.upper() == "GRU":
            self.rnn = GroupGRUCell(vs, self.hidden_size, self.num_units,
                                    self.dtype)
        else:
            self.rnn = GroupLSTMCell(vs, self.hidden_size, self.num_units,
                                     self.dtype)
        self.query_net = GroupDense(self.hidden_size,
                                    ks * self.num_input_heads,
                                    self.num_units, dtype=self.dtype)
        cvs = self._comm_value_size
        self.comm_query = GroupDense(self.hidden_size,
                                     self.comm_query_size
                                     * self.num_comm_heads,
                                     self.num_units, dtype=self.dtype)
        self.comm_key = GroupDense(self.hidden_size,
                                   self.comm_key_size * self.num_comm_heads,
                                   self.num_units, dtype=self.dtype)
        self.comm_value = GroupDense(self.hidden_size,
                                     cvs * self.num_comm_heads,
                                     self.num_units, dtype=self.dtype)
        self.comm_out = GroupDense(self.num_comm_heads * cvs, cvs,
                                   self.num_units, dtype=self.dtype)
        self.drop_in = nn.Dropout(self.input_dropout)
        self.drop_comm = nn.Dropout(self.comm_dropout)

    def _input_attention(self, x, h, train):
        """x: (B, 2, input_size) with the null input appended; h: (B, N, H).
        Returns per-unit inputs (B, N, value_size) and the top-k mask
        (B, N) (reference rim.py:179-215)."""
        keys = _heads(self.key_net(x), self.num_input_heads,
                      self.input_key_size)
        values = _heads(self.value_net(x), self.num_input_heads,
                        self.input_value_size).mean(axis=1)  # (B, 2, vs)
        queries = _heads(self.query_net(h), self.num_input_heads,
                         self.input_query_size)
        scores = jnp.einsum("bhnk,bhmk->bhnm", queries, keys) \
            / (self.input_key_size ** 0.5)
        scores = scores.mean(axis=1)                         # (B, N, 2)

        not_null = scores[:, :, 0]
        _, top_idx = jax.lax.top_k(not_null, self.k)
        mask = jnp.zeros(not_null.shape, x.dtype)
        mask = jax.vmap(lambda m, i: m.at[i].set(1.0))(mask, top_idx)

        probs = jax.nn.softmax(scores, axis=-1)
        probs = self.drop_in(probs, deterministic=not train)
        inputs = jnp.einsum("bnm,bmv->bnv", probs, values) * mask[..., None]
        return inputs, mask

    def _communication(self, h, mask, train):
        """Masked multi-head attention between units, residual
        (reference rim.py:217-259)."""
        q = _heads(self.comm_query(h), self.num_comm_heads,
                   self.comm_query_size)
        k = _heads(self.comm_key(h), self.num_comm_heads,
                   self.comm_key_size)
        v = _heads(self.comm_value(h), self.num_comm_heads,
                   self._comm_value_size)
        scores = jnp.einsum("bhnk,bhmk->bhnm", q, k) \
            / (self.comm_key_size ** 0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = probs * mask[:, None, :, None]   # only active units query
        probs = self.drop_comm(probs, deterministic=not train)
        ctx = jnp.einsum("bhnm,bhmv->bhnv", probs, v)
        b, _, n, _ = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, -1)
        return self.comm_out(ctx) + h

    def __call__(self, x, hs, cs=None, *, train: bool = False):
        """x: (B, input_size) one timestep; hs/cs: (B, N, H)."""
        if x.ndim == 3:
            x = x.squeeze(1)
        x2 = jnp.stack([x, jnp.zeros_like(x)], axis=1)   # append null input
        inputs, mask = self._input_attention(x2, hs, train)
        h_old, c_old = hs, cs

        if cs is not None:
            hs, cs = self.rnn(inputs, hs, cs)
        else:
            hs = self.rnn(inputs, hs)

        m = mask[..., None]
        # blocked gradient through inactive units (reference rim.py:8-18)
        h_new = m * hs + (1.0 - m) * jax.lax.stop_gradient(hs)
        h_new = self._communication(h_new, mask, train)

        hs = m * h_new + (1.0 - m) * h_old
        if cs is not None:
            cs = m * cs + (1.0 - m) * c_old
        return hs, cs


class _RIMStep(nn.Module):
    """Scan body: carry = (h, c), input = one timestep."""

    input_size: int
    hidden_size: int
    num_units: int
    k: int
    rnn_cell: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        h, c = RIMCell(self.input_size, self.hidden_size, self.num_units,
                       self.k, self.rnn_cell, dtype=self.dtype)(x, h, c)
        return (h, c), h.reshape(h.shape[0], -1)


class RIM(nn.Module):
    """Multi-layer (optionally bidirectional) RIM over a sequence
    (reference rim.py:300-398).  Input (T, B, F); output
    (T, B, num_directions * N * H) plus final per-layer states."""

    input_size: int
    hidden_size: int
    num_units: int
    k: int
    rnn_cell: str = "LSTM"
    n_layers: int = 1
    bidirectional: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        nd = 2 if self.bidirectional else 1
        Scan = nn.scan(_RIMStep, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        cells = []
        for i in range(self.n_layers * nd):
            first = i < nd
            in_size = (self.input_size if first
                       else nd * self.hidden_size * self.num_units)
            cells.append(Scan(in_size, self.hidden_size, self.num_units,
                              self.k, self.rnn_cell, dtype=self.dtype))
        self.cells = cells

    def _scan_dir(self, cell, hi, ci, xs, reverse: bool):
        if reverse:
            xs = xs[::-1]
        carry, ys = cell((hi, ci), xs)
        if reverse:
            ys = ys[::-1]
        return carry, ys

    def __call__(self, x, h=None, c=None, *, key=None):
        """x: (T, B, F).  h/c: (layers*dirs, B, N*H) or None (then sampled
        from `key` like the reference's randn init, rim.py:355-366)."""
        nd = 2 if self.bidirectional else 1
        T, B = x.shape[:2]
        n_states = self.n_layers * nd
        if h is None:
            assert key is not None, "need key for random initial states"
            kh, kc = jax.random.split(key)
            h = jax.random.normal(
                kh, (n_states, B, self.hidden_size * self.num_units),
                self.dtype)
            if self.rnn_cell.upper() == "LSTM":
                c = jax.random.normal(
                    kc, (n_states, B, self.hidden_size * self.num_units),
                    self.dtype)
        use_c = self.rnn_cell.upper() == "LSTM"

        hs_out, cs_out = [], []
        for layer in range(self.n_layers):
            outs = []
            for d in range(nd):
                i = layer * nd + d
                hi = h[i].reshape(B, self.num_units, self.hidden_size)
                ci = (c[i].reshape(B, self.num_units, self.hidden_size)
                      if use_c else None)
                (hf, cf), ys = self._scan_dir(self.cells[i], hi, ci, x,
                                              reverse=(d == 1))
                outs.append(ys)
                hs_out.append(hf.reshape(B, -1))
                if use_c:
                    cs_out.append(cf.reshape(B, -1))
            x = outs[0] if nd == 1 else jnp.concatenate(outs, axis=2)
        h_fin = jnp.stack(hs_out)
        if use_c:
            return x, h_fin, jnp.stack(cs_out)
        return x, h_fin
