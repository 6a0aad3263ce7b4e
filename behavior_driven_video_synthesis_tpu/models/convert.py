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


def _norm_conv(sd: Dict, prefix: str) -> Dict:
    """Reference NormConv2d -> our NormConv2d params (OIHW -> HWIO)."""
    v = np.asarray(sd[f"{prefix}.conv.weight_v"])
    return {
        "v": jnp.asarray(v.transpose(2, 3, 1, 0)),
        "g": jnp.asarray(np.asarray(sd[f"{prefix}.conv.weight_g"]
                                    ).reshape(-1)),
        "bias": _a(sd[f"{prefix}.conv.bias"]),
        "gamma": jnp.asarray(np.asarray(sd[f"{prefix}.gamma"]).reshape(-1)),
        "beta": jnp.asarray(np.asarray(sd[f"{prefix}.beta"]).reshape(-1)),
    }


def _rnb(sd: Dict, prefix: str, residual: bool) -> Dict:
    """Reference VunetRNB -> ours.  Residual blocks carry a 1x1 'nin'
    (our inner NormConv2d_0) before the main conv (NormConv2d_1)."""
    if residual:
        return {"NormConv2d_0": _norm_conv(sd, f"{prefix}.nin"),
                "NormConv2d_1": _norm_conv(sd, f"{prefix}.conv")}
    return {"NormConv2d_0": _norm_conv(sd, f"{prefix}.conv")}


def _enc_up(sd: Dict, ref: str, n_scales: int) -> Dict:
    out = {"NormConv2d_0": _norm_conv(sd, f"{ref}.nin")}
    for k in range(2 * n_scales):
        out[f"VunetRNB_{k}"] = _rnb(sd, f"{ref}.blocks.{k}", residual=False)
    for i in range(n_scales - 1):
        out[f"Downsample_{i}"] = {
            "NormConv2d_0": _norm_conv(sd, f"{ref}.downs.{i}.down")}
    return out


def convert_vunet_alter(state_dict: Dict, n_scales: int, n_scales_x: int,
                        n_latent_scales: int = 2) -> Dict:
    """Reference VunetAlter (models/vunets.py:426-515, conv_layer_type=l1)
    state dict -> {"params": ...} for our VUNet(variant="alter").

    Module-order mapping (verified against both construction orders):
      eu/du: nin, 2 RNBs/scale, downsample between scales
      ed:    nin, per latent scale [res-RNB, mu conv, logstd conv, res-RNB,
             subpixel up], final res-RNB
      dd:    nin, per scale [res-RNB, (latent: z-injection res-RNB),
             res-RNB, upsample], out conv
    """
    sd = state_dict
    params: Dict = {}
    params["eu"] = _enc_up(sd, "eu", n_scales_x)
    params["du"] = _enc_up(sd, "du", n_scales)

    ed: Dict = {"NormConv2d_0": _norm_conv(sd, "ed.nin")}
    conv_idx = 1
    for i in range(n_latent_scales):
        ed[f"VunetRNB_{2 * i}"] = _rnb(sd, f"ed.blocks.{2 * i}",
                                       residual=True)
        ed[f"NormConv2d_{conv_idx}"] = _norm_conv(
            sd, f"ed.make_latent_params.{i}")
        ed[f"NormConv2d_{conv_idx + 1}"] = _norm_conv(
            sd, f"ed.make_logstds.{i}")
        conv_idx += 2
        ed[f"VunetRNB_{2 * i + 1}"] = _rnb(sd, f"ed.blocks.{2 * i + 1}",
                                           residual=True)
        ed[f"Upsample_{i}"] = {
            "NormConv2d_0": _norm_conv(sd, f"ed.ups.{i}.up")}
    ed[f"VunetRNB_{2 * n_latent_scales}"] = _rnb(sd, "ed.fin_block",
                                                 residual=True)
    params["ed"] = ed

    dd: Dict = {"NormConv2d_0": _norm_conv(sd, "dd.nin")}
    rnb_idx = 0
    for i in range(n_scales):
        dd[f"VunetRNB_{rnb_idx}"] = _rnb(sd, f"dd.blocks.{2 * i}",
                                         residual=True)
        rnb_idx += 1
        if i < n_latent_scales:
            dd[f"VunetRNB_{rnb_idx}"] = _rnb(sd, f"dd.auto_blocks.{i}",
                                             residual=True)
            rnb_idx += 1
        dd[f"VunetRNB_{rnb_idx}"] = _rnb(sd, f"dd.blocks.{2 * i + 1}",
                                         residual=True)
        rnb_idx += 1
        if i + 1 < n_scales:
            dd[f"Upsample_{i}"] = {
                "NormConv2d_0": _norm_conv(sd, f"dd.ups.{i}.up")}
    dd["NormConv2d_1"] = _norm_conv(sd, "dd.out_conv")
    params["dd"] = dd
    return {"params": params}


def vunet_alter_reference_state_dict(variables: Dict, n_scales: int,
                                     n_scales_x: int,
                                     n_latent_scales: int = 2) -> Dict:
    """Inverse of convert_vunet_alter: our params -> a reference-named
    state dict (numpy, torch layouts).  Used for round-trip testing and for
    EXPORTING our checkpoints to the reference."""
    out: Dict = {}

    def put_conv(prefix: str, p: Dict):
        v = np.asarray(p["v"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
        out[f"{prefix}.conv.weight_v"] = v
        out[f"{prefix}.conv.weight_g"] = np.asarray(p["g"]).reshape(
            -1, 1, 1, 1)
        out[f"{prefix}.conv.bias"] = np.asarray(p["bias"])
        out[f"{prefix}.gamma"] = np.asarray(p["gamma"]).reshape(1, -1, 1, 1)
        out[f"{prefix}.beta"] = np.asarray(p["beta"]).reshape(1, -1, 1, 1)

    def put_rnb(prefix: str, p: Dict):
        if "NormConv2d_1" in p:
            put_conv(f"{prefix}.nin", p["NormConv2d_0"])
            put_conv(f"{prefix}.conv", p["NormConv2d_1"])
        else:
            put_conv(f"{prefix}.conv", p["NormConv2d_0"])

    prm = variables["params"]
    for ref, ns in (("eu", n_scales_x), ("du", n_scales)):
        put_conv(f"{ref}.nin", prm[ref]["NormConv2d_0"])
        for k in range(2 * ns):
            put_rnb(f"{ref}.blocks.{k}", prm[ref][f"VunetRNB_{k}"])
        for i in range(ns - 1):
            put_conv(f"{ref}.downs.{i}.down",
                     prm[ref][f"Downsample_{i}"]["NormConv2d_0"])

    ed = prm["ed"]
    put_conv("ed.nin", ed["NormConv2d_0"])
    conv_idx = 1
    for i in range(n_latent_scales):
        put_rnb(f"ed.blocks.{2 * i}", ed[f"VunetRNB_{2 * i}"])
        put_conv(f"ed.make_latent_params.{i}",
                 ed[f"NormConv2d_{conv_idx}"])
        put_conv(f"ed.make_logstds.{i}", ed[f"NormConv2d_{conv_idx + 1}"])
        conv_idx += 2
        put_rnb(f"ed.blocks.{2 * i + 1}", ed[f"VunetRNB_{2 * i + 1}"])
        put_conv(f"ed.ups.{i}.up", ed[f"Upsample_{i}"]["NormConv2d_0"])
    put_rnb("ed.fin_block", ed[f"VunetRNB_{2 * n_latent_scales}"])

    dd = prm["dd"]
    put_conv("dd.nin", dd["NormConv2d_0"])
    rnb_idx = 0
    for i in range(n_scales):
        put_rnb(f"dd.blocks.{2 * i}", dd[f"VunetRNB_{rnb_idx}"])
        rnb_idx += 1
        if i < n_latent_scales:
            put_rnb(f"dd.auto_blocks.{i}", dd[f"VunetRNB_{rnb_idx}"])
            rnb_idx += 1
        put_rnb(f"dd.blocks.{2 * i + 1}", dd[f"VunetRNB_{rnb_idx}"])
        rnb_idx += 1
        if i + 1 < n_scales:
            put_conv(f"dd.ups.{i}.up",
                     dd[f"Upsample_{i}"]["NormConv2d_0"])
    put_conv("dd.out_conv", dd["NormConv2d_1"])
    return out


def convert_vunet_org(state_dict: Dict, n_scales: int, n_scales_x: int,
                      n_latent_scales: int = 2) -> Dict:
    """Reference VunetOrg (models/vunets.py:18-106) -> our
    VUNet(variant="org"), including the 4-group autoregressive prior
    (auto_lp convs, auto_blocks RNBs, latent_nins)."""
    sd = state_dict
    params: Dict = {}
    params["eu"] = _enc_up(sd, "eu", n_scales_x)
    params["du"] = _enc_up(sd, "du", n_scales)

    # EncDown (org): one latent-param conv per scale, fixed std.
    ed: Dict = {"NormConv2d_0": _norm_conv(sd, "ed.nin")}
    for i in range(n_latent_scales):
        ed[f"VunetRNB_{2 * i}"] = _rnb(sd, f"ed.blocks.{2 * i}",
                                       residual=True)
        ed[f"NormConv2d_{1 + i}"] = _norm_conv(
            sd, f"ed.make_latent_params.{i}")
        ed[f"VunetRNB_{2 * i + 1}"] = _rnb(sd, f"ed.blocks.{2 * i + 1}",
                                           residual=True)
        ed[f"Upsample_{i}"] = {
            "NormConv2d_0": _norm_conv(sd, f"ed.ups.{i}.up")}
    ed[f"VunetRNB_{2 * n_latent_scales}"] = _rnb(sd, "ed.fin_block",
                                                 residual=True)
    params["ed"] = ed

    # DecDown (org): AR prior per latent scale.
    dd: Dict = {"NormConv2d_0": _norm_conv(sd, "dd.nin")}
    rnb_idx, conv_idx = 0, 1
    for i in range(n_scales):
        dd[f"VunetRNB_{rnb_idx}"] = _rnb(sd, f"dd.blocks.{2 * i}",
                                         residual=True)
        rnb_idx += 1
        if i < n_latent_scales:
            scale = f"l_{i}"
            dd[f"VunetRNB_{rnb_idx}"] = _rnb(
                sd, f"dd.auto_blocks.{scale}.0", residual=False)
            rnb_idx += 1
            for l in range(4):
                dd[f"NormConv2d_{conv_idx}"] = _norm_conv(
                    sd, f"dd.auto_lp.{scale}.{l}")
                conv_idx += 1
                if l + 1 < 4:
                    dd[f"VunetRNB_{rnb_idx}"] = _rnb(
                        sd, f"dd.auto_blocks.{scale}.{l + 1}",
                        residual=True)
                    rnb_idx += 1
            dd[f"NormConv2d_{conv_idx}"] = _norm_conv(
                sd, f"dd.latent_nins.{scale}")
            conv_idx += 1
        dd[f"VunetRNB_{rnb_idx}"] = _rnb(sd, f"dd.blocks.{2 * i + 1}",
                                         residual=True)
        rnb_idx += 1
        if i + 1 < n_scales:
            dd[f"Upsample_{i}"] = {
                "NormConv2d_0": _norm_conv(sd, f"dd.ups.{i}.up")}
    dd[f"NormConv2d_{conv_idx}"] = _norm_conv(sd, "dd.out_conv")
    params["dd"] = dd
    return {"params": params}


def vunet_org_reference_state_dict(variables: Dict, n_scales: int,
                                   n_scales_x: int,
                                   n_latent_scales: int = 2) -> Dict:
    """Inverse of convert_vunet_org (export to the reference format)."""
    out: Dict = {}

    def put_conv(prefix: str, p: Dict):
        out[f"{prefix}.conv.weight_v"] = np.asarray(p["v"]).transpose(
            3, 2, 0, 1)
        out[f"{prefix}.conv.weight_g"] = np.asarray(p["g"]).reshape(
            -1, 1, 1, 1)
        out[f"{prefix}.conv.bias"] = np.asarray(p["bias"])
        out[f"{prefix}.gamma"] = np.asarray(p["gamma"]).reshape(1, -1, 1, 1)
        out[f"{prefix}.beta"] = np.asarray(p["beta"]).reshape(1, -1, 1, 1)

    def put_rnb(prefix: str, p: Dict):
        if "NormConv2d_1" in p:
            put_conv(f"{prefix}.nin", p["NormConv2d_0"])
            put_conv(f"{prefix}.conv", p["NormConv2d_1"])
        else:
            put_conv(f"{prefix}.conv", p["NormConv2d_0"])

    prm = variables["params"]
    for ref, ns in (("eu", n_scales_x), ("du", n_scales)):
        put_conv(f"{ref}.nin", prm[ref]["NormConv2d_0"])
        for k in range(2 * ns):
            put_rnb(f"{ref}.blocks.{k}", prm[ref][f"VunetRNB_{k}"])
        for i in range(ns - 1):
            put_conv(f"{ref}.downs.{i}.down",
                     prm[ref][f"Downsample_{i}"]["NormConv2d_0"])

    ed = prm["ed"]
    put_conv("ed.nin", ed["NormConv2d_0"])
    for i in range(n_latent_scales):
        put_rnb(f"ed.blocks.{2 * i}", ed[f"VunetRNB_{2 * i}"])
        put_conv(f"ed.make_latent_params.{i}", ed[f"NormConv2d_{1 + i}"])
        put_rnb(f"ed.blocks.{2 * i + 1}", ed[f"VunetRNB_{2 * i + 1}"])
        put_conv(f"ed.ups.{i}.up", ed[f"Upsample_{i}"]["NormConv2d_0"])
    put_rnb("ed.fin_block", ed[f"VunetRNB_{2 * n_latent_scales}"])

    dd = prm["dd"]
    put_conv("dd.nin", dd["NormConv2d_0"])
    rnb_idx, conv_idx = 0, 1
    for i in range(n_scales):
        put_rnb(f"dd.blocks.{2 * i}", dd[f"VunetRNB_{rnb_idx}"])
        rnb_idx += 1
        if i < n_latent_scales:
            scale = f"l_{i}"
            put_rnb(f"dd.auto_blocks.{scale}.0", dd[f"VunetRNB_{rnb_idx}"])
            rnb_idx += 1
            for l in range(4):
                put_conv(f"dd.auto_lp.{scale}.{l}",
                         dd[f"NormConv2d_{conv_idx}"])
                conv_idx += 1
                if l + 1 < 4:
                    put_rnb(f"dd.auto_blocks.{scale}.{l + 1}",
                            dd[f"VunetRNB_{rnb_idx}"])
                    rnb_idx += 1
            put_conv(f"dd.latent_nins.{scale}",
                     dd[f"NormConv2d_{conv_idx}"])
            conv_idx += 1
        put_rnb(f"dd.blocks.{2 * i + 1}", dd[f"VunetRNB_{rnb_idx}"])
        rnb_idx += 1
        if i + 1 < n_scales:
            put_conv(f"dd.ups.{i}.up",
                     dd[f"Upsample_{i}"]["NormConv2d_0"])
    put_conv("dd.out_conv", dd[f"NormConv2d_{conv_idx}"])
    return out


def _dense(sd: Dict, prefix: str) -> Dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]),
            "bias": _a(sd[f"{prefix}.bias"])}


def _lstm_l0(sd: Dict, prefix: str) -> Dict:
    """torch nn.LSTM layer-0 weights -> our ops.recurrent.LSTM params
    (gate order (i, f, g, o) matches by construction)."""
    return {
        "w_ih": _t(sd[f"{prefix}.weight_ih_l0"]),
        "w_hh": _t(sd[f"{prefix}.weight_hh_l0"]),
        "b_ih": _a(sd[f"{prefix}.bias_ih_l0"]),
        "b_hh": _a(sd[f"{prefix}.bias_hh_l0"]),
    }


def _fc_resnet(sd: Dict, prefix: str) -> Dict:
    """Reference FCResnet (pose_behavior_rnn.py:212-239) -> our
    probes.FCResnet (compact Dense order: shortcut, fc1, fc2, fc3)."""
    return {
        "Dense_0": _dense(sd, f"{prefix}.shortcut"),
        "Dense_1": _dense(sd, f"{prefix}.fc1"),
        "Dense_2": _dense(sd, f"{prefix}.fc2"),
        "Dense_3": _dense(sd, f"{prefix}.fc3"),
    }


def convert_mtvae(state_dict: Dict) -> Dict:
    """Reference MTVAE (pose_behavior_rnn.py:241-358) -> our models.mtvae.

    The reference declares two heads its forward never calls (``make_mu``,
    ``cov``, :274-276); they carry no information and are dropped here (our
    module never creates them)."""
    sd = state_dict
    return {"params": {
        "lstm_enc": _lstm_l0(sd, "lstm_enc"),
        "lstm_dec": _lstm_l0(sd, "lstm_dec"),
        "latent_enc": _fc_resnet(sd, "latent_enc"),
        "latent_dec": _fc_resnet(sd, "latent_dec"),
        "make_keypoints": _dense(sd, "make_keypoints"),
        "inv_z": _dense(sd, "inv_z"),
        "make_h_dec": _dense(sd, "make_h_dec"),
        "make_c_dec": _dense(sd, "make_c_dec"),
    }}


def _conv1d(sd: Dict, key: str) -> Dict:
    """torch Conv1d weight (Cout, Cin, K) -> flax Conv kernel (K, Cin, Cout)."""
    return {"kernel": jnp.asarray(
        np.transpose(np.asarray(sd[key]), (2, 1, 0)))}


def _group_norm(sd: Dict, prefix: str) -> Dict:
    return {"scale": _a(sd[f"{prefix}.weight"]),
            "bias": _a(sd[f"{prefix}.bias"])}


def convert_sequence_disc_michael(state_dict: Dict,
                                  layers=(2, 1, 1, 1)) -> Dict:
    """Reference Sequence_disc_michael (pose_discriminator.py:284-360) ->
    our discriminators.SequenceDiscMichael.

    Layout notes: torch runs Conv1d over (B, C, T); ours is channels-last
    (B, T, C), so conv weights transpose (Cout, Cin, K) -> (K, Cin, Cout)
    and the final ``fc`` — applied to a C-major flatten of (B, 32, 13) in
    the reference (:356) vs our T-major flatten of (B, 13, 32) — permutes
    its input axis from c*T + t to t*C + c."""
    sd = state_dict
    params: Dict = {
        "Conv_0": _conv1d(sd, "conv1.weight"),
        "GroupNorm_0": _group_norm(sd, "bn1"),
    }
    block_idx = 0
    for li, planes in enumerate((64, 32)):
        for bi in range(layers[li]):
            ref = f"layer{li + 1}.{bi}"
            blk = {
                "Conv_0": _conv1d(sd, f"{ref}.conv1.weight"),
                "GroupNorm_0": _group_norm(sd, f"{ref}.bn1"),
                "Conv_1": _conv1d(sd, f"{ref}.conv2.weight"),
                "GroupNorm_1": _group_norm(sd, f"{ref}.bn2"),
            }
            if f"{ref}.downsample.0.weight" in sd:
                blk["Conv_2"] = _conv1d(sd, f"{ref}.downsample.0.weight")
                blk["GroupNorm_2"] = _group_norm(sd, f"{ref}.downsample.1")
            params[f"_BasicBlock1D_{block_idx}"] = blk
            block_idx += 1
    w = np.asarray(sd["fc.weight"])            # (out, C*T), C-major flatten
    out_dim, flat = w.shape
    C = 32
    T = flat // C
    kernel = w.reshape(out_dim, C, T).transpose(2, 1, 0).reshape(T * C,
                                                                 out_dim)
    params["Dense_0"] = {"kernel": jnp.asarray(kernel)}
    return {"params": params}


def convert_regressor_fly(state_dict: Dict) -> Dict:
    """Reference Regressor_fly (pose_behavior_rnn.py:47-62) -> our
    probes.RegressorFly (compact Dense order fc1,fc2,fc3,fc4,fc5)."""
    sd = state_dict
    return {"params": {
        f"Dense_{i}": _dense(sd, f"fc{i + 1}") for i in range(5)}}


def convert_classifier_action(state_dict: Dict) -> Dict:
    """Reference Classifier_action (pose_behavior_rnn.py:19-31) -> our
    probes.ClassifierAction (LSTM + fc1 + fc3)."""
    sd = state_dict
    return {"params": {
        "LSTM_0": _lstm_l0(sd, "RNN"),
        "Dense_0": _dense(sd, "fc1"),
        "Dense_1": _dense(sd, "fc3"),
    }}


def convert_classifier_action_beta(state_dict: Dict) -> Dict:
    """Reference Classifier_action_beta (pose_behavior_rnn.py:65-73) ->
    our probes.ClassifierActionBeta (a single Dense)."""
    return {"params": {"Dense_0": _dense(state_dict, "fc1")}}
