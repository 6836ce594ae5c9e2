"""LARS optimizer (optax), reference semantics (util/lars.py:4-37):

no trust-ratio scaling or weight decay for params with ndim <= 1; momentum
0.9 buffers accumulate the (possibly trust-scaled) update; step is
p ← p − lr · mu. Used by the linear probe (eval_linprobe.py:117).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class LarsState(NamedTuple):
    mu: optax.Updates
    count: jnp.ndarray


def lars(
    learning_rate: Union[float, Callable],
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    trust_coefficient: float = 0.001,
) -> optax.GradientTransformation:
    def init(params):
        return LarsState(mu=jax.tree.map(jnp.zeros_like, params),
                         count=jnp.zeros([], jnp.int32))

    def update(updates, state, params):
        def adjust(g, p):
            if p.ndim <= 1:
                return g
            dp = g + weight_decay * p
            pn = jnp.linalg.norm(p)
            un = jnp.linalg.norm(dp)
            q = jnp.where(
                pn > 0.0,
                jnp.where(un > 0.0, trust_coefficient * pn / un, 1.0),
                1.0,
            )
            return dp * q

        adjusted = jax.tree.map(adjust, updates, params)
        mu = jax.tree.map(lambda m, d: momentum * m + d, state.mu, adjusted)
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        out = jax.tree.map(lambda m: -lr * m, mu)
        return out, LarsState(mu=mu, count=state.count + 1)

    return optax.GradientTransformation(init, update)
