"""Checkpoint IO: named-module registry → single msgpack file.

TPU-native equivalent of the reference's `CheckpointIO`
(reference: nr3d_lib/checkpoint.py:19-166): register named modules, save
their states plus extra scalars into one file, load with ignore/only-use key
filters, and pick up the newest checkpoint with `sorted_ckpts` ordering
(final > latest > highest-iteration).

Registered objects may be:
  * a raw pytree of arrays (saved as-is),
  * an object with ``state_dict()`` / ``load_state_dict()``,
  * a ``flax.nnx.Module`` (serialized via ``nnx.state`` / ``nnx.update``).
"""

from __future__ import annotations

import os
import re
from glob import glob
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

__all__ = ["CheckpointIO", "sorted_ckpts"]


def _is_nnx_module(obj) -> bool:
    try:
        from flax import nnx

        return isinstance(obj, nnx.Module)
    except ImportError:
        return False


def _get_state(obj) -> Any:
    if hasattr(obj, "state_dict"):
        return obj.state_dict()
    if _is_nnx_module(obj):
        from flax import nnx

        return nnx.to_pure_dict(nnx.state(obj))
    return obj  # raw pytree


def _to_numpy(tree):
    import jax

    def conv(x):
        if hasattr(x, "dtype") and hasattr(x, "shape"):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(conv, tree)


def _str_keys(tree):
    """msgpack requires string map keys; nnx states use int keys for lists."""
    if isinstance(tree, dict):
        return {str(k): _str_keys(v) for k, v in tree.items()}
    return tree


def _unstr_keys(tree):
    if isinstance(tree, dict):
        return {(int(k) if isinstance(k, str) and k.lstrip("-").isdigit() else k):
                _unstr_keys(v) for k, v in tree.items()}
    return tree


def sorted_ckpts(ckpt_dir: str, ext: str = ".msgpack") -> List[str]:
    """Order: final > latest > highest iteration (reference: checkpoint.py:136-166)."""
    paths = sorted(glob(os.path.join(ckpt_dir, f"*{ext}")))
    final, latest, iters = [], [], []
    for p in paths:
        name = os.path.basename(p)
        if "final" in name:
            final.append(p)
        elif "latest" in name:
            latest.append(p)
        else:
            m = re.search(r"(\d+)", name)
            iters.append((int(m.group(1)) if m else -1, p))
    iters = [p for _, p in sorted(iters)]
    return iters + latest + final  # last element = the one to resume from


class CheckpointIO:
    def __init__(self, checkpoint_dir: str = "./ckpts", allow_mkdir: bool = True):
        self.checkpoint_dir = checkpoint_dir
        if allow_mkdir:
            os.makedirs(checkpoint_dir, exist_ok=True)
        self.module_dict: Dict[str, Any] = {}

    def register_modules(self, **kwargs):
        self.module_dict.update(kwargs)

    # ------------------------------------------------------------------ save
    def save(self, filename: str, **extra_scalars) -> str:
        from flax import serialization

        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        payload = {k: _str_keys(_to_numpy(_get_state(m)))
                   for k, m in self.module_dict.items()}
        payload["__extras__"] = dict(extra_scalars)
        with open(filename, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))
        return filename

    # ------------------------------------------------------------------ load
    def load(self, filename: str,
             ignore_keys: Sequence[str] = (),
             only_use_keys: Optional[Sequence[str]] = None) -> Dict[str, Any]:
        from flax import serialization

        if not os.path.isabs(filename) and not os.path.exists(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        with open(filename, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        extras = payload.pop("__extras__", {})
        payload = {k: _unstr_keys(v) for k, v in payload.items()}
        for name, state in payload.items():
            if name in ignore_keys:
                continue
            if only_use_keys is not None and name not in only_use_keys:
                continue
            if name not in self.module_dict:
                continue
            obj = self.module_dict[name]
            if hasattr(obj, "before_load_state_dict"):
                # shape-dependent rebuild hook (reference: lotd_neus.py:96)
                obj.before_load_state_dict(state)
            if hasattr(obj, "load_state_dict"):
                obj.load_state_dict(state)
            elif _is_nnx_module(obj):
                from flax import nnx

                st = nnx.state(obj)
                nnx.replace_by_pure_dict(st, state)
                nnx.update(obj, st)
            else:
                self.module_dict[name] = state
        return extras

    def load_latest(self, **kwargs) -> Optional[Dict[str, Any]]:
        ordered = sorted_ckpts(self.checkpoint_dir)
        if not ordered:
            return None
        return self.load(ordered[-1], **kwargs)
