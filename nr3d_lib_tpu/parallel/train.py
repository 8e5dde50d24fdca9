"""Sharded training-step construction.

The reference's only multi-chip strategy is NCCL DDP driven by downstream
trainers (SURVEY.md §2.3). Here scaling is mesh-native: rays shard over the
``data`` axis, parameters replicate (or shard over ``block`` for forest
scenes), and pjit inserts the gradient all-reduce over ICI — no process
groups, no explicit allreduce calls.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nr3d_lib_tpu.parallel import get_mesh

__all__ = ["make_sharded_train_step", "shard_rays", "replicate"]


def shard_rays(tree, mesh=None):
    """Place per-ray arrays sharded over the 'data' axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh or get_mesh()
    s = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh=None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh or get_mesh()
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def make_sharded_train_step(loss_fn: Callable, optimizer, mesh=None,
                            donate: bool = True):
    """Build a jitted DP train step.

    loss_fn(params, batch, key) → scalar loss (per-ray work inside; batch
    leaves have leading ray dimension). Returns step(params, opt_state,
    batch, key) → (params, opt_state, loss) with rays sharded over 'data'
    and the grad all-reduce emitted by pjit.
    """
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh or get_mesh()
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else ())
