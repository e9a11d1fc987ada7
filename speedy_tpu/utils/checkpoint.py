"""Checkpoint/resume of the full model state.

New capability relative to the reference, which cannot restart at all: its
NetCDF output is float32 diagnostic grid fields, insufficient to restore the
spectral state (SURVEY section 5.4; prognostics.f90:27-31 names a restart
file but only implements rest-state starts).

A checkpoint stores every leaf of the ModelState pytree (both leapfrog time
levels, surface slab state, radiation state, SPPT AR(1) state + PRNG key)
plus the model date, in a single .npz. Loading restores bit-exact state on
the same precision config.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .calendar import Datetime

_SEP = "::"


def _flatten(state) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in leaves:
        key = _SEP.join(str(p.name) if hasattr(p, "name") else str(p.idx)
                        for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, state, date: Datetime,
                    model_step: int = 0) -> None:
    arrays = _flatten(state)
    arrays["__date__"] = np.array(
        [date.year, date.month, date.day, date.hour, date.minute, model_step],
        dtype=np.int64)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, template) -> Tuple[object, Datetime, int]:
    """Restore a ModelState using ``template`` (a state with the right
    structure, e.g. from Model.initialize) for the pytree shape."""
    data = np.load(path)
    d = data["__date__"]
    date = Datetime(*[int(x) for x in d[:5]])
    model_step = int(d[5])

    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves:
        key = _SEP.join(str(p.name) if hasattr(p, "name") else str(p.idx)
                        for p in path)
        arr = data[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        new_leaves.append(jnp.asarray(arr, leaf.dtype))
    state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), new_leaves)
    return state, date, model_step
