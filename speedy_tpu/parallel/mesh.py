"""Device-mesh helpers for SPMD runs.

Parallelism map for this model (SURVEY section 5.8):
* 'dp'  — ensemble members (data parallel; SPPT ensembles vmap over members)
* 'sp'  — spatial sharding: latitude bands in grid space / total-wavenumber
  (n) bands in spectral space. The spectral<->grid transforms contract over
  these axes, so resharding between phases is an all-to-all that XLA's SPMD
  partitioner inserts from the sharding constraints — the spectral-GCM
  analog of a distributed-FFT transpose.

The reference is fully serial (no MPI/OpenMP anywhere in source/); this
entire capability is new in the TPU build.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host (DCN) initialization: call once per host process before any
    other JAX API. After this, jax.devices() is the GLOBAL device list, so
    make_mesh() below builds a multi-host mesh and pjit's collectives ride
    ICI within a slice and DCN across hosts (SURVEY section 5.8).

    Arguments mirror jax.distributed.initialize and fall back to its
    cluster-environment auto-detection (TPU pods set them automatically).
    Returns the process index.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def make_mesh(n_ensemble: int = 1, n_spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_ensemble * n_spatial
    assert len(devices) >= n, (len(devices), n)
    arr = np.array(devices[:n]).reshape(n_ensemble, n_spatial)
    return Mesh(arr, ("dp", "sp"))


def ensemble_state_sharding(mesh: Mesh, state) -> object:
    """Shard an ensemble-stacked ModelState: member axis over 'dp', spatial
    axes over 'sp'.

    Grid-space [il, ix] fields shard latitude over 'sp' when il divides
    evenly by the 'sp' size (latitude rows are independent in the zonal DFT
    and physics is columnwise — SURVEY section 5.8); otherwise they stay
    replicated (and a warning is emitted, since a non-trivial 'sp' axis then
    shards nothing in grid space).

    Spectral [mx, nx, 2] fields shard the n axis over 'sp' when nx divides
    evenly (T30: nx=32); otherwise (T85: nx=87) they stay replicated, which
    turns the Legendre *analysis* einsum into a tensor-parallel contraction:
    each device contracts its latitude band and XLA inserts one psum over
    'sp' — the sharded-Legendre-contraction scheme of BASELINE config 5.
    Synthesis is then communication-free (each device reads the replicated
    spectral state and writes only its own latitude band)."""
    n_sp = mesh.shape["sp"]
    if n_sp > 1:
        shardable = any(
            x.ndim >= 3 and x.shape[-2] % n_sp == 0
            for x in jax.tree.leaves(state))
        if not shardable:
            import warnings
            warnings.warn(
                f"sp={n_sp} divides neither a latitude nor a spectral-n axis "
                "of any state leaf; all spatial axes will be replicated and "
                "the 'sp' mesh axis does no work")

    def spec_of(x):
        if x.ndim >= 4 and x.shape[-1] == 2:      # [E, ..., mx, nx, 2]
            spec = [None] * x.ndim
            spec[0] = "dp"
            if x.shape[-2] % n_sp == 0:
                spec[-2] = "sp"
            return NamedSharding(mesh, P(*spec))
        if x.ndim >= 3:                            # [E, ..., il, ix]
            spec = [None] * x.ndim
            spec[0] = "dp"
            if x.shape[-2] % n_sp == 0:
                spec[-2] = "sp"
            return NamedSharding(mesh, P(*spec))
        if x.ndim >= 1:
            return NamedSharding(mesh, P("dp"))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec_of, state)


def replicated(mesh: Mesh, tree) -> object:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
