"""Functional dropout with a *traced* rate.

Unlike `flax.linen.Dropout`, the rate here is a runtime value, not a
module attribute. That is load-bearing for the population trainer: grid
candidates differing only in dropout share one compiled program, with
per-member rates as a vmapped input (SURVEY.md §7 — same-shape
candidates vmap directly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(x: jax.Array, rate, rng: jax.Array | None,
            deterministic: bool) -> jax.Array:
    """Inverted dropout. `rate` may be a Python float or a traced scalar."""
    if deterministic or rng is None:
        return x
    keep_prob = 1.0 - rate
    keep = jax.random.bernoulli(rng, keep_prob, x.shape)
    # Guard the rate==1 edge (all dropped) against division by zero.
    scale = jnp.where(keep_prob > 0, 1.0 / jnp.maximum(keep_prob, 1e-12), 0.0)
    return jnp.where(keep, x * scale, jnp.zeros_like(x))
