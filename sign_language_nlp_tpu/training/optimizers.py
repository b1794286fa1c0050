"""Functional optimizers with per-cell learning rates.

torch.optim parity for the optimizers the reference configures
(`torch.optim.SGD` with momentum/nesterov, config-transformer.yaml:40-43):

  SGD:  v ← μ·v + g;  update = v            (dampening 0)
        nesterov: update = g + μ·v
        p ← p − lr · update

Plain optax can't express a *vector* of learning rates across a vmapped
population, which is exactly what plateau scheduling needs (each cell's
LR decays on its own schedule) — hence these hand-rolled, pytree-mapped
rules. `lr` is always an array broadcastable against the population
axis; for single fits it is shape [].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SGDConfig(NamedTuple):
    momentum: float = 0.0
    nesterov: bool = False
    weight_decay: float = 0.0


class AdamConfig(NamedTuple):
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    # torch.optim.AdamW semantics: decay applied to params directly
    # (p *= 1 - lr*wd), NOT folded into the gradient/moments.
    decoupled: bool = False


def _bcast(lr, leaf):
    """Broadcast per-cell lr [P] (or scalar) against a leaf [P, ...]."""
    extra = leaf.ndim - jnp.ndim(lr)
    return jnp.reshape(lr, jnp.shape(lr) + (1,) * extra)


def init_opt_state(name: str, params):
    zeros = jax.tree.map(jnp.zeros_like, params)
    if _canon(name) == "sgd":
        return {"velocity": zeros}
    return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, params),
            "count": jnp.zeros((), jnp.int32)}


def sgd_update(params, grads, state, lr, cfg: SGDConfig):
    mu = cfg.momentum

    def upd(p, g, v):
        if cfg.weight_decay:
            g = g + cfg.weight_decay * p
        v_new = mu * v + g
        step = g + mu * v_new if cfg.nesterov else v_new
        return p - _bcast(lr, p) * step, v_new

    flat = jax.tree.map(upd, params, grads, state["velocity"])
    new_params = jax.tree.map(lambda t: t[0], flat,
                              is_leaf=lambda t: isinstance(t, tuple))
    new_vel = jax.tree.map(lambda t: t[1], flat,
                           is_leaf=lambda t: isinstance(t, tuple))
    return new_params, {"velocity": new_vel}


def adam_update(params, grads, state, lr, cfg: AdamConfig):
    count = state["count"] + 1
    b1, b2 = cfg.b1, cfg.b2
    bc1 = 1.0 - b1 ** count.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count.astype(jnp.float32)

    def upd(p, g, m, v):
        if cfg.weight_decay and not cfg.decoupled:
            g = g + cfg.weight_decay * p
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * (g * g)
        step = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + cfg.eps)
        lr_p = _bcast(lr, p)
        if cfg.weight_decay and cfg.decoupled:
            p = p * (1.0 - lr_p * cfg.weight_decay)
        return p - lr_p * step, m_new, v_new

    flat = jax.tree.map(upd, params, grads, state["m"], state["v"])
    pick = lambda i: jax.tree.map(  # noqa: E731
        lambda t: t[i], flat, is_leaf=lambda t: isinstance(t, tuple))
    return pick(0), {"m": pick(1), "v": pick(2), "count": count}


def _canon(name: str) -> str:
    short = name.rsplit(".", 1)[-1].lower()
    if short in ("sgd",):
        return "sgd"
    if short == "adam":
        return "adam"
    if short == "adamw":
        return "adamw"
    raise ValueError(f"Unknown optimizer: '{name}'")


def resolve_optimizer(name: str, optimizer_args: dict | None = None):
    """Config name (e.g. the reference's `torch.optim.SGD`) → (update_fn,
    init_fn). update_fn(params, grads, state, lr) → (params, state)."""
    optimizer_args = dict(optimizer_args or {})
    kind = _canon(name)
    if kind == "sgd":
        cfg = SGDConfig(momentum=float(optimizer_args.get("momentum", 0.0)),
                        nesterov=bool(optimizer_args.get("nesterov", False)),
                        weight_decay=float(
                            optimizer_args.get("weight_decay", 0.0)))
        return (lambda p, g, s, lr: sgd_update(p, g, s, lr, cfg),
                lambda p: init_opt_state("sgd", p))
    cfg = AdamConfig(
        b1=float(optimizer_args.get("betas", (0.9, 0.999))[0]),
        b2=float(optimizer_args.get("betas", (0.9, 0.999))[1]),
        eps=float(optimizer_args.get("eps", 1e-8)),
        weight_decay=float(optimizer_args.get(
            "weight_decay", 0.01 if kind == "adamw" else 0.0)),
        decoupled=(kind == "adamw"))
    return (lambda p, g, s, lr: adam_update(p, g, s, lr, cfg),
            lambda p: init_opt_state("adam", p))


def clip_by_global_norm(grads, max_norm: float):
    """torch clip_grad_norm_: scale all grads by max_norm/total_norm when
    total_norm > max_norm (reference GradientNormClipping(0.5),
    helper.py:227-229)."""
    leaves = jax.tree.leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)
