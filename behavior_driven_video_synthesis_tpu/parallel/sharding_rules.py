"""Parameter sharding rules for hybrid data x model meshes.

The reference needs only data parallelism (its models fit one chip many
times over — SURVEY.md §5.8), so dp is the default.  For scale headroom the
framework also supports:

* tensor parallelism — matrix-shaped parameters whose last dimension
  divides a "model" mesh axis are sharded column-wise; GSPMD inserts the
  all-reduces (`infer_param_shardings` / `shard_module_state`);
* FSDP/ZeRO-3 — parameters AND optimizer moments sharded over the *data*
  axis on each leaf's largest divisible dimension, so per-device HBM holds
  1/N of the model state; GSPMD all-gathers parameters at use and
  reduce-scatters gradients (`infer_fsdp_shardings` /
  `shard_module_state_fsdp`).  Motivating model: the production-size latent
  flow (630M params -> 2.5 GB params + 5 GB adam moments replicated), which
  saturates a 16 GB chip; sharded 8-ways it costs <1 GB/device.

Sequence / pipeline parallelism are intentionally NOT provided: T≈50
recurrences and <100M-param models have nothing to gain (SURVEY.md §5.7).
"""
from __future__ import annotations

import math
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def infer_param_shardings(params: Any, mesh: Mesh,
                          model_axis: str = "model",
                          min_dim: int = 128) -> Any:
    """Column-shard large matrix params over the model axis; replicate the
    rest.

    A leaf is sharded on its LAST axis iff it has >= 2 dims, the last dim is
    divisible by the model-axis size, and the last dim >= min_dim (so biases
    and tiny heads stay replicated).
    """
    if model_axis not in mesh.axis_names:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params)
    m = mesh.shape[model_axis]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if (len(shape) >= 2 and shape[-1] >= min_dim
                and shape[-1] % m == 0):
            spec = [None] * (len(shape) - 1) + [model_axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def _fsdp_leaf_spec(shape, axis: str, n: int, min_size: int):
    """FSDP rule for one leaf: shard the LARGEST dimension divisible by the
    axis size, iff the leaf has at least ``min_size`` elements; otherwise
    replicate (biases, scalars, and tiny heads aren't worth a collective)."""
    if shape and math.prod(shape) >= min_size:
        cands = [d for d in range(len(shape))
                 if shape[d] >= n and shape[d] % n == 0]
        if cands:
            d = max(cands, key=lambda i: shape[i])
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def infer_fsdp_shardings(tree: Any, mesh: Mesh, axis: str = "data",
                         min_size: int = 1 << 14) -> Any:
    """FSDP/ZeRO-3 shardings: every large leaf sharded over ``axis`` on its
    largest divisible dimension, small leaves replicated.  Applies uniformly
    to parameters and to optimizer moments (adam mu/nu mirror the param
    shapes, so the same per-leaf rule keeps them co-sharded)."""
    n = mesh.shape[axis]

    def rule(leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        return NamedSharding(mesh, _fsdp_leaf_spec(shape, axis, n, min_size))

    return jax.tree_util.tree_map(rule, tree)


def shard_module_state_fsdp(state, mesh: Mesh, axis: str = "data",
                            min_size: int = 1 << 14):
    """Shard a train-state pytree FSDP-style: params and optimizer moments
    of every ModuleState are sharded over the data axis (largest-divisible-
    dim rule); buffers and non-ModuleState leaves are replicated.

    Pair with ``state_shardings`` + ``jit(..., out_shardings=...)`` so the
    updated state provably stays sharded across steps."""
    from ..train.state import ModuleState

    n = mesh.shape[axis]

    def place(leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        return jax.device_put(
            leaf,
            NamedSharding(mesh, _fsdp_leaf_spec(shape, axis, n, min_size)))

    def handle(node):
        if isinstance(node, ModuleState):
            new_params = jax.tree_util.tree_map(place, node.params)
            new_opt = jax.tree_util.tree_map(place, node.opt_state)
            buffers = node.buffers
            if buffers is not None:
                buffers = jax.tree_util.tree_map(
                    lambda l: jax.device_put(l, NamedSharding(mesh, P())),
                    buffers)
            return node.replace(params=new_params, opt_state=new_opt,
                                buffers=buffers)
        return jax.tree_util.tree_map(
            lambda l: jax.device_put(l, NamedSharding(mesh, P())), node)

    return jax.tree_util.tree_map(
        handle, state,
        is_leaf=lambda x: isinstance(x, ModuleState))


def state_shardings(state) -> Any:
    """The sharding tree of an already-placed state pytree — pass as
    ``out_shardings`` so jit provably returns the state with the same
    layout (donation then reuses the input buffers)."""
    return jax.tree_util.tree_map(lambda l: l.sharding, state)


def place_with_shardings(tree: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def shard_module_state(state, mesh: Mesh, model_axis: str = "model",
                       min_dim: int = 128):
    """Shard a ModuleState / train-state pytree: params (and the optimizer
    moments, which mirror them) get the column rules; everything else is
    replicated."""
    from ..train.state import ModuleState

    def handle(node):
        if isinstance(node, ModuleState):
            p_sh = infer_param_shardings(node.params, mesh, model_axis,
                                         min_dim)
            new_params = place_with_shardings(node.params, p_sh)

            def opt_rule(leaf):
                # adam mu/nu mirror the param tree structure per transform;
                # shard leaves that match a param shape, replicate others
                return jax.device_put(
                    leaf, infer_param_shardings(leaf, mesh, model_axis,
                                                min_dim)
                    if hasattr(leaf, "shape") else None)

            new_opt = jax.tree_util.tree_map(
                lambda l: jax.device_put(
                    l,
                    NamedSharding(mesh, P(*(
                        [None] * (len(l.shape) - 1) + [model_axis]))
                        if (len(getattr(l, "shape", ())) >= 2
                            and l.shape[-1] >= min_dim
                            and l.shape[-1] % mesh.shape[model_axis] == 0)
                        else P())),
                node.opt_state)
            buffers = node.buffers
            if buffers is not None:
                buffers = jax.tree_util.tree_map(
                    lambda l: jax.device_put(l, NamedSharding(mesh, P())),
                    buffers)
            return node.replace(params=new_params, opt_state=new_opt,
                                buffers=buffers)
        return jax.tree_util.tree_map(
            lambda l: jax.device_put(l, NamedSharding(mesh, P())), node)

    return jax.tree_util.tree_map(
        handle, state,
        is_leaf=lambda n: isinstance(n, ModuleState))
