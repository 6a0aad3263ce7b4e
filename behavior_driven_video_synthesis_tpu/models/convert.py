"""Torch-checkpoint converters: reference ``.pth`` state dicts -> flax params.

Enables drop-in reuse of checkpoints trained with the PyTorch reference
(SURVEY.md §7.3 "numerical parity with checkpoints"): torch LSTM gate order
(i, f, g, o) matches our cells by construction; weight_norm (g, v) maps to
NormConv/NormDense (g, v); layouts transpose from torch's (out, in) to our
(in, out).

Converters:
  * convert_behavior_net  — ResidualBehaviorNet (pose_behavior_rnn.py:538)
  * convert_latent_flow   — UnsupervisedTransformer2 (simple_flow.py:136)
  * (VGG/Inception converters live in perceptual.py / inception.py)
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


def _t(x):
    return jnp.asarray(np.asarray(x).T)


def _a(x):
    return jnp.asarray(np.asarray(x))


def _norm_dense_from_1x1_conv(sd: Dict, prefix: str) -> Dict:
    """Reference NormConv2d used as a 1x1 conv over (B, C, 1, 1) ->
    our NormDense: weight_v (Cout, Cin, 1, 1) -> v (Cin, Cout)."""
    v = np.asarray(sd[f"{prefix}.conv.weight_v"])[:, :, 0, 0]  # (Co, Ci)
    g = np.asarray(sd[f"{prefix}.conv.weight_g"]).reshape(-1)
    return {
        "v": jnp.asarray(v.T),
        "g": jnp.asarray(g),
        "bias": _a(sd[f"{prefix}.conv.bias"]),
        "gamma": jnp.asarray(np.asarray(sd[f"{prefix}.gamma"]).reshape(-1)),
        "beta": jnp.asarray(np.asarray(sd[f"{prefix}.beta"]).reshape(-1)),
    }


def convert_behavior_net(state_dict: Dict) -> Dict:
    """Reference ResidualBehaviorNet state dict -> {"params": ...} for our
    ResidualBehaviorNet (LSTM decoder, information bottleneck)."""
    sd = state_dict
    params = {
        "b_enc": {
            "rnn": {
                "w_ih": _t(sd["b_enc.rnn.weight_ih_l0"]),
                "w_hh": _t(sd["b_enc.rnn.weight_hh_l0"]),
                "b_ih": _a(sd["b_enc.rnn.bias_ih_l0"]),
                "b_hh": _a(sd["b_enc.rnn.bias_hh_l0"]),
            },
            "mu_fn": _norm_dense_from_1x1_conv(sd, "b_enc.mu_fn"),
            "std_fn": _norm_dense_from_1x1_conv(sd, "b_enc.std_fn"),
        },
        "decoder": {
            "w_ih": _t(sd["decoder.rnn.weight_ih"]),
            "w_hh": _t(sd["decoder.rnn.weight_hh"]),
            "b_ih": _a(sd["decoder.rnn.bias_ih"]),
            "b_hh": _a(sd["decoder.rnn.bias_hh"]),
            "w_out": _t(sd["decoder.n_out.weight"]),
            "b_out": _a(sd["decoder.n_out.bias"]),
        },
    }
    if "decoder.n_in.weight" in sd:
        params["decoder"]["w_nin"] = _t(sd["decoder.n_in.weight"])
        params["decoder"]["b_nin"] = _a(sd["decoder.n_in.bias"])
    return {"params": params}


def _fc_net(sd: Dict, prefix: str, n_layers: int) -> Dict:
    """BasicFullyConnectedNet: main.{0,2,4,...} Linear -> Dense_{0..}."""
    out = {}
    for j in range(n_layers):
        out[f"Dense_{j}"] = {
            "kernel": _t(sd[f"{prefix}.main.{2 * j}.weight"]),
            "bias": _a(sd[f"{prefix}.main.{2 * j}.bias"]),
        }
    return out


def convert_latent_flow(state_dict: Dict, n_flows: int,
                        hidden_depth: int = 2) -> Dict:
    """Reference UnsupervisedTransformer2 state dict -> our LatentFlow
    variables ({"params", "buffers"})."""
    sd = state_dict
    n_dense = hidden_depth + 2  # in + depth hidden + out
    params: Dict = {"flow": {}}
    buffers: Dict = {"flow": {}}
    for i in range(n_flows):
        ref = f"flow.sub_layers.{i}"
        layer = {
            "norm_layer": {
                "loc": jnp.asarray(
                    np.asarray(sd[f"{ref}.norm_layer.loc"]).reshape(-1)),
                "scale": jnp.asarray(
                    np.asarray(sd[f"{ref}.norm_layer.scale"]).reshape(-1)),
            },
            "coupling": {
                **{f"s_{j}": _fc_net(sd, f"{ref}.coupling.s.{j}", n_dense)
                   for j in range(2)},
                **{f"t_{j}": _fc_net(sd, f"{ref}.coupling.t.{j}", n_dense)
                   for j in range(2)},
            },
        }
        params["flow"][f"sub_layers_{i}"] = layer
        buffers["flow"][f"sub_layers_{i}"] = {
            "shuffle": {
                "perm": jnp.asarray(np.asarray(
                    sd[f"{ref}.shuffle.forward_shuffle_idx"]).astype(
                        np.int32)),
            }
        }
    return {"params": params, "buffers": buffers}
