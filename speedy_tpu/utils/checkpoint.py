"""Checkpoint/resume of the full model state.

New capability relative to the reference, which cannot restart at all: its
NetCDF output is float32 diagnostic grid fields, insufficient to restore the
spectral state (SURVEY section 5.4; prognostics.f90:27-31 names a restart
file but only implements rest-state starts).

A checkpoint stores every leaf of the ModelState pytree (both leapfrog time
levels, surface slab state, radiation state, SPPT AR(1) state + PRNG key)
plus the model date, the original run start date, the host-side SST-anomaly
window (mc.clim.sstan3 — it lives outside ModelState and would otherwise be
stale on resume), and config metadata, in a single .npz. Loading restores
bit-exact state on the same precision config and validates the config
metadata so a resumed run cannot silently change physics (e.g. dropping the
SPPT state because --sppt was not re-passed).
"""
from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .calendar import Datetime

_SEP = "::"

# config fields that must match between save and resume for the restored
# trajectory to continue the original one
CONFIG_META_KEYS = ("preset", "precision", "sppt_on", "sea_coupling_flag",
                    "ice_coupling_flag", "land_coupling_flag",
                    "sst_anomaly_forcing", "increase_co2", "trunc", "kx",
                    "nsteps")


def config_meta(cfg) -> dict:
    return {k: getattr(cfg, k) for k in CONFIG_META_KEYS if hasattr(cfg, k)}


def _flatten(state) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in leaves:
        key = _SEP.join(str(p.name) if hasattr(p, "name") else str(p.idx)
                        for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, state, date: Datetime,
                    model_step: int = 0,
                    start: Optional[Datetime] = None,
                    sstan3=None, cfg=None) -> None:
    arrays = _flatten(state)
    arrays["__date__"] = np.array(
        [date.year, date.month, date.day, date.hour, date.minute, model_step],
        dtype=np.int64)
    if start is not None:
        arrays["__start__"] = np.array(
            [start.year, start.month, start.day, start.hour, start.minute],
            dtype=np.int64)
    if sstan3 is not None:
        arrays["__sstan3__"] = np.asarray(sstan3)
    if cfg is not None:
        arrays["__config__"] = np.frombuffer(
            json.dumps(config_meta(cfg)).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, template,
                    cfg=None) -> Tuple[object, Datetime, int, dict]:
    """Restore a ModelState using ``template`` (a state with the right
    structure, e.g. from Model.initialize) for the pytree shape.

    Returns (state, date, model_step, extras) where extras may contain
    'start' (original run start Datetime) and 'sstan3' (the SST-anomaly
    window at checkpoint time). If ``cfg`` is given, its metadata is
    validated against the checkpoint's and a mismatch raises ValueError.
    """
    data = np.load(path)
    d = data["__date__"]
    date = Datetime(*[int(x) for x in d[:5]])
    model_step = int(d[5])

    extras = {}
    if "__start__" in data:
        extras["start"] = Datetime(*[int(x) for x in data["__start__"]])
    if "__sstan3__" in data:
        extras["sstan3"] = data["__sstan3__"]
    if "__config__" in data:
        saved = json.loads(bytes(data["__config__"]).decode())
        extras["config"] = saved
        if cfg is not None:
            mine = config_meta(cfg)
            bad = {k: (saved[k], mine[k]) for k in saved
                   if k in mine and mine[k] != saved[k]}
            if bad:
                raise ValueError(
                    "checkpoint config mismatch (saved vs current): "
                    + ", ".join(f"{k}: {s!r} != {m!r}"
                                for k, (s, m) in bad.items()))

    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    template_keys = set()
    new_leaves = []
    for path_, leaf in leaves:
        key = _SEP.join(str(p.name) if hasattr(p, "name") else str(p.idx)
                        for p in path_)
        template_keys.add(key)
        if key not in data:
            raise ValueError(
                f"checkpoint is missing state leaf {key!r} — it was saved "
                "with a different model configuration")
        arr = data[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        new_leaves.append(jnp.asarray(arr, leaf.dtype))
    # leaves present in the checkpoint but absent from the template would be
    # silently dropped (e.g. SPPT state when --sppt is not re-passed): refuse.
    extra_keys = [k for k in data.files
                  if not k.startswith("__") and k not in template_keys]
    if extra_keys:
        raise ValueError(
            "checkpoint holds state the current config would drop: "
            f"{extra_keys} — re-run with the original flags (e.g. --sppt)")
    state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), new_leaves)
    return state, date, model_step, extras
