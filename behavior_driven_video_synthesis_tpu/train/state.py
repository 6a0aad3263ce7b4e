"""Train-state containers.

The reference smuggles controller state (gamma) through optimizer
param_groups on checkpoint (SURVEY.md §5.3); here every piece of mutable
training state — per-module params + optimizer states, the gamma controller,
the step counter — lives in one explicit pytree that jit threads through the
step function and orbax checkpoints wholesale.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class ModuleState:
    """Parameters + optimizer state for one trainable module."""

    params: Any
    opt_state: Any
    buffers: Any = None  # non-trainable variables (e.g. flow permutations)

    @classmethod
    def create(cls, variables: Dict, tx: optax.GradientTransformation):
        params = variables["params"]
        buffers = variables.get("buffers")
        return cls(params=params, opt_state=tx.init(params), buffers=buffers)

    def variables(self) -> Dict:
        v = {"params": self.params}
        if self.buffers is not None:
            v["buffers"] = self.buffers
        return v

    def apply_gradients(self, tx: optax.GradientTransformation, grads,
                        enabled=None):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if enabled is not None:
            # traced on/off switch: keep params AND optimizer state frozen
            # when disabled (matches the reference skipping the step entirely)
            pred = jnp.asarray(enabled, bool)
            sel = lambda n, o: jnp.where(pred, n, o)
            new_params = jax.tree_util.tree_map(sel, new_params, self.params)
            new_opt = jax.tree_util.tree_map(sel, new_opt, self.opt_state)
        return self.replace(params=new_params, opt_state=new_opt)


def torch_adam(lr, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 0.0,
               ) -> optax.GradientTransformation:
    """Adam with torch.optim.Adam's exact semantics.

    Two places optax defaults diverge from torch and silently break
    lockstep training parity (tests/test_reference_train_parity.py):

      * torch's ``weight_decay`` is L2-IN-GRAD (grad += wd * p before the
        moment updates) — optax.adamw is DECOUPLED AdamW, a different
        algorithm.  Here the decay is chained in front of the moments.
      * torch applies eps OUTSIDE the sqrt (update = m_hat /
        (sqrt(v_hat) + eps)), which is optax's ``eps`` with
        ``eps_root=0`` — the optax defaults already match, pinned here
        explicitly.

    ``lr`` may be a float or an optax schedule (the reference wraps its
    net optimizer in MultiStepLR, experiments/behavior_net.py:341).
    """
    steps = []
    if weight_decay > 0.0:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0))
    if callable(lr):
        steps.append(optax.scale_by_schedule(lambda c: -lr(c)))
    else:
        steps.append(optax.scale(-lr))
    return optax.chain(*steps)
