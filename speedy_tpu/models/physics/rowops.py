"""Static-row updates without scatter.

jnp's ``x.at[k].set/add`` lowers to the XLA ``scatter`` primitive, which
the Pallas TPU (Mosaic) lowering does not implement — and neither is
``dynamic_update_slice`` on values (both probed on hardware, r05). The
fused column-physics kernel (physics/fused.py) therefore needs the level
updates expressed with primitives Mosaic does lower; ``concatenate`` is,
and produces bit-identical values (the updated row is computed with the
same arithmetic, untouched rows are copied). The physics modules use
these helpers unconditionally so the plain-XLA and Pallas paths share
one trace (XLA folds the concatenates back into in-place updates).
"""
from __future__ import annotations

import jax.numpy as jnp


def row_set(x, k, v):
    """x.at[k].set(v) for a static level index k (any array rank)."""
    k = int(k) % x.shape[0]
    v = jnp.broadcast_to(jnp.asarray(v, x.dtype), x.shape[1:])[None]
    # Mosaic rejects zero-extent vector slices: emit only non-empty parts
    parts = ([x[:k]] if k > 0 else []) + [v] \
        + ([x[k + 1:]] if k + 1 < x.shape[0] else [])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def row_add(x, k, v):
    """x.at[k].add(v) for a static level index k."""
    return row_set(x, k, x[int(k) % x.shape[0]] + v)


def tail_add(x, k, v):
    """x.at[k:].add(v) for a static start index k."""
    k = int(k)
    if k == 0:
        return x + v
    return jnp.concatenate([x[:k], x[k:] + v], axis=0)
