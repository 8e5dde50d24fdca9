"""Training utilities: optimizers, schedulers, chunked queries, grad tools.

Reference: nr3d_lib/models/utils.py:199-439 (get_optimizer/get_scheduler),
:441 (batchify_query), :168 (calc_grad_norm / clip). Optimizers map onto
optax; schedulers are optax schedules (the reference's multistep /
warmup-cosine / exponential / plenoxels-style lr_fn family).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["get_optimizer", "get_scheduler", "batchify_query",
           "calc_grad_norm", "clip_grad_norm"]

Array = jax.Array


def get_scheduler(type: str = "constant", lr: float = 5e-4, **kwargs):
    """→ optax schedule fn it→lr (reference get_scheduler :199-439)."""
    import optax

    t = type.lower()
    if t in ("constant", "none"):
        return optax.constant_schedule(lr)
    if t in ("multistep", "multi_step"):
        milestones = kwargs.get("milestones", [])
        gamma = kwargs.get("gamma", 0.1)
        return optax.piecewise_constant_schedule(
            lr, {int(m): gamma for m in milestones})
    if t in ("exponential", "exp"):
        total = kwargs.get("num_iters", kwargs.get("total_steps", 100000))
        min_factor = kwargs.get("min_factor", 0.1)
        return optax.exponential_decay(
            lr, total, min_factor, staircase=False)
    if t in ("warmup_cosine", "warmupcosine", "cosine"):
        warmup = kwargs.get("warmup_steps", kwargs.get("warmup", 500))
        total = kwargs.get("num_iters", kwargs.get("total_steps", 100000))
        min_factor = kwargs.get("min_factor", 0.05)
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, total, end_value=lr * min_factor)
    if t in ("plenoxels", "exponential_step"):
        # delayed exponential with optional cosine-delay ramp
        total = kwargs.get("num_iters", 100000)
        final = kwargs.get("lr_final", lr * 0.01)
        delay_steps = kwargs.get("delay_steps", 0)
        delay_mult = kwargs.get("delay_mult", 1.0)

        def sched(step):
            s = jnp.clip(step / total, 0.0, 1.0)
            base = jnp.exp(jnp.log(lr) * (1 - s) + jnp.log(final) * s)
            if delay_steps > 0:
                delay = delay_mult + (1 - delay_mult) * jnp.sin(
                    0.5 * jnp.pi * jnp.clip(step / delay_steps, 0.0, 1.0))
            else:
                delay = 1.0
            return delay * base

        return sched
    raise ValueError(f"Unknown scheduler: {type}")


def get_optimizer(type: str = "adam", lr: float = 5e-4,
                  scheduler_cfg: Optional[dict] = None, **kwargs):
    """→ optax GradientTransformation (reference get_optimizer)."""
    import optax

    sched = get_scheduler(lr=lr, **(scheduler_cfg or {"type": "constant"}))
    t = type.lower()
    if t == "adam":
        opt = optax.adam(sched, b1=kwargs.get("beta1", 0.9),
                         b2=kwargs.get("beta2", 0.99),
                         eps=kwargs.get("eps", 1e-15))
    elif t == "adamw":
        opt = optax.adamw(sched, weight_decay=kwargs.get("weight_decay", 1e-2))
    elif t == "sgd":
        opt = optax.sgd(sched, momentum=kwargs.get("momentum", 0.9))
    elif t == "rmsprop":
        opt = optax.rmsprop(sched)
    else:
        raise ValueError(f"Unknown optimizer: {type}")
    clip = kwargs.get("clip_grad_norm")
    if clip:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt


def batchify_query(fn: Callable, *arrays: Array, chunk: int = 2 ** 16,
                   dim: int = 0):
    """Evaluate fn over chunks to bound memory (reference batchify_query :441).

    Static shapes: pads the last chunk. Works under jit only if n is static.
    """
    n = arrays[0].shape[dim]
    if n <= chunk:
        return fn(*arrays)
    outs = []
    for s in range(0, n, chunk):
        outs.append(fn(*[a[s:s + chunk] for a in arrays]))
    first = outs[0]
    if isinstance(first, dict):
        return {k: jnp.concatenate([o[k] for o in outs], axis=dim) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(jnp.concatenate([o[i] for o in outs], axis=dim)
                           for i in range(len(first)))
    return jnp.concatenate(outs, axis=dim)


def calc_grad_norm(grads, norm_type: float = 2.0) -> Array:
    """Global grad norm of a pytree (reference calc_grad_norm :168)."""
    leaves = jax.tree_util.tree_leaves(grads)
    if norm_type == float("inf"):
        return jnp.max(jnp.asarray([jnp.max(jnp.abs(l)) for l in leaves]))
    return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))


def clip_grad_norm(grads, max_norm: float):
    """Scale the pytree so its global norm ≤ max_norm."""
    norm = calc_grad_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm
