"""Train-state containers.

Each victim model carries (params, batch_stats, optimizer state) as one
pytree; the whole GAN is a pytree of those, so a training step is a pure
``(state, batch, rng) -> (state, metrics)`` function that jit/pjit can
shard. Replaces the reference's module-with-attached-optimizer mutation
(e.g. ``train_torch.py:76-83``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class ModelState(struct.PyTreeNode):
    """Params + mutable collections + optimizer state for one network."""

    params: Any
    batch_stats: Any
    extra: Any                     # e.g. spectral-norm u/v vectors
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, module, variables, tx) -> "ModelState":
        variables = dict(variables)
        params = variables.pop("params")
        batch_stats = variables.pop("batch_stats", FrozenDict())
        extra = FrozenDict(variables)  # anything else (e.g. 'spectral')
        return cls(params=params, batch_stats=batch_stats, extra=extra,
                   opt_state=tx.init(params), apply_fn=module.apply, tx=tx)

    def variables(self) -> dict:
        v = {"params": self.params, "batch_stats": self.batch_stats}
        v.update(self.extra)
        return v

    def apply_gradients(self, grads) -> "ModelState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def adam_torch(lr: float, beta1: float, beta2: float,
               weight_decay: float = 0.0, eps: float = 1e-8):
    """torch.optim.Adam semantics. torch's ``weight_decay`` is L2 added to
    the gradient *before* the Adam moments (not decoupled AdamW) — matched
    with ``optax.add_decayed_weights`` placed before ``scale_by_adam``."""
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps))
    chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def tree_size(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
