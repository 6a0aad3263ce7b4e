"""Parameter sharding rules for hybrid data x model meshes.

The reference needs only data parallelism (its models fit one chip many
times over — SURVEY.md §5.8), so dp is the default.  For scale headroom the
framework also supports tensor-parallel parameter sharding over a "model"
mesh axis: matrix-shaped parameters whose last dimension divides the model
axis are sharded column-wise; GSPMD inserts the all-reduces.  Sequence /
pipeline parallelism are intentionally NOT provided: T≈50 recurrences and
<100M-param models have nothing to gain (SURVEY.md §5.7).
"""
from __future__ import annotations

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
