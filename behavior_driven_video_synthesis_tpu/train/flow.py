"""Flow-stage training: fit the latent flow over frozen cVAE posteriors.

Reference: the second training stage (experiments/behavior_net.py:704-714,
:951-1014) freezes the cVAE, infers b per batch, and trains
UnsupervisedTransformer2 with FlowLoss on the detached latents.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.flows.transformer import flow_loss, gaussian_reference_nll
from .state import ModuleState


@struct.dataclass
class FlowTrainState:
    step: jnp.ndarray
    flow: ModuleState


def create_flow_state(key, flow_model, tx, sample_b) -> FlowTrainState:
    """ActNorm data-dependent init happens here: init sees a REAL batch of
    behavior latents (the reference's first-batch init, lib/modules.py:270)."""
    variables = flow_model.init({"params": key}, sample_b)
    return FlowTrainState(
        step=jnp.zeros((), jnp.int32),
        flow=ModuleState.create(variables, tx),
    )


def make_flow_train_step(net_model, flow_model, tx, seq_len: int) -> Callable:
    """Jittable flow step: infer b with the frozen net, NLL-train the flow."""

    def train_step(state: FlowTrainState, net_params, batch, key
                   ) -> Tuple[FlowTrainState, Dict[str, jnp.ndarray]]:
        kps = batch["keypoints"].astype(jnp.float32)
        seq_b = kps[:, :-1]
        b, mu, logstd, pre = net_model.apply(
            {"params": net_params}, seq_b, sample=False,
            rngs={"sample": key}, method=net_model.infer_b,
        )
        b = jax.lax.stop_gradient(b)

        def loss_fn(fp):
            z, logdet = flow_model.apply(
                {"params": fp, "buffers": state.flow.buffers}, b
            )
            loss = flow_loss(z, logdet)
            return loss, (z, logdet)

        (loss, (z, logdet)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.flow.params)
        new_flow = state.flow.apply_gradients(tx, grads)
        metrics = {
            "flow_loss": loss,
            "grad_norm": optax.global_norm(grads),
            "nlogdet_loss": -jnp.mean(logdet),
            "nll_loss": loss + jnp.mean(logdet),
            "reference_nll_loss": gaussian_reference_nll(
                jax.lax.stop_gradient(z)),
        }
        return state.replace(step=state.step + 1, flow=new_flow), metrics

    return train_step


def make_flow_sampler(flow_model) -> Callable:
    """(flow_state_vars, key, n) -> b samples through the inverse flow."""

    def sample(flow_variables, key, n: int):
        return flow_model.apply(flow_variables, key, n,
                                method=flow_model.sample)

    return sample
