"""Model configuration.

TPU-native replacement for the reference's compile-time parameter module and
namelist reader (reference: source/params.f90:19-43, 54-73; namelist.nml).
Everything the Fortran fixes at compile time is a field of one frozen
dataclass here, so resolution presets (T30/T85/...) are runtime choices and
the whole model is resolution-parametric.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model configuration (hashable; safe to close over in jit).

    Geometry fields mirror source/params.f90:19-27, stepping fields
    params.f90:30-37, physics flags params.f90:40-43, and the user namelist
    knobs params.f90:49-50.
    """

    # -- Geometry (params.f90:19-27) --
    trunc: int = 30     # spectral truncation total wavenumber
    ix: int = 96        # number of longitudes
    il: int = 48        # number of latitudes (full sphere)
    kx: int = 8         # number of vertical (sigma) levels
    ntr: int = 1        # number of tracers (q is tracer 0)

    # -- Time stepping (params.f90:30-37) --
    nsteps: int = 36    # steps per day
    rob: float = 0.05   # Robert filter coefficient
    wil: float = 0.53   # Williams filter parameter
    alph: float = 0.5   # semi-implicit off-centering

    # -- Physics cadence / flags (params.f90:40-43) --
    iseasc: int = 1       # seasonal cycle on
    nstrad: int = 3       # shortwave radiation every nstrad steps
    sppt_on: bool = False
    issty0: int = 1979    # first year in the SST anomaly file

    # -- Horizontal-diffusion damping times, hours (dynamical_constants
    # .f90:17-20 defaults; the T170 preset shortens them — the reference's
    # values are tuned for T30's truncation scale) --
    thd: float = 2.4
    thdd: float = 2.4
    thds: float = 12.0

    # -- Coupling flags (land_model.f90:41, sea_model.f90:60-75) --
    land_coupling_flag: int = 1
    sea_coupling_flag: int = 0
    ice_coupling_flag: int = 1
    sst_anomaly_forcing: bool = False
    increase_co2: bool = False

    # -- Regional ocean domains (sea_model.f90:126-131, 218-236, 446-523) --
    # With l_globe=True the slab-ocean/ice anomaly damping acts everywhere;
    # otherwise the union of the enabled regional masks (smoothed at the
    # latitude boundaries) selects where cdsea/cdice are nonzero.
    l_globe: bool = True
    l_northe: bool = False    # Northern-hemisphere oceans (lat > 20N)
    l_natlan: bool = False    # North Atlantic (20-80N, 100W-45E)
    l_npacif: bool = False    # North Pacific (20-65N, 120E-100W)
    l_tropic: bool = False    # Tropics (30S-30N)
    l_indian: bool = False    # Indian Ocean (30S-30N, 30-120E)
    l_elnino: bool = False    # El Nino weight mask (sea_model.f90:499-519;
    #                           defined but never wired to a flag upstream)

    # -- User/namelist knobs (params.f90:49-50, namelist.nml) --
    nsteps_out: int = 1
    nstdia: int = 180

    # -- TPU build knobs (new capabilities) --
    precision: str = "fp32"      # "fp32" | "fp64"  (reference is fp64-only)
    n_ensemble: int = 1          # vmapped ensemble members (SPPT ensembles)
    check_interval: int = 36     # steps between stability guard checks
    scan_unroll: int = 1         # lax.scan unroll of the SW-triple day scan
    #                              (>1 trades compile time for less loop
    #                               bookkeeping in the latency-bound step)
    synthesis_split: bool = False  # EXPERIMENT (keep False): synthesize
    #                              grid fields in consumer-sized groups
    #                              instead of one merged 65-channel batch,
    #                              to eliminate the [B,65,il,ix] layout
    #                              copies (~2 x 1.6 ms/triple on the
    #                              64-member span). NEGATIVE RESULT (r04):
    #                              bit-identical to merged on CPU (fp64 and
    #                              fp32), but the TPU-compiled vmapped day
    #                              scan of the split program is numerically
    #                              UNSTABLE — ensemble eddy KE grows
    #                              7->115->1800->NaN over 8 days where the
    #                              merged path stays at 5->46. The small
    #                              per-group einsums take different
    #                              bf16/accumulation strategies whose
    #                              roundoff feeds back through the
    #                              recurrent scan. Do not enable on TPU.
    tables_bf16: bool = False    # EXPERIMENT: store the big transform
    #                              tables (cpol/DFT) in bfloat16 (fp32 runs
    #                              only). MEASURED NEUTRAL at T170 (r04:
    #                              135.6 vs 135.5 days/min) — the trace
    #                              shows XLA already converts the fp32
    #                              tables to bf16 once and stages the bf16
    #                              copies, so explicit bf16 storage saves
    #                              nothing. Kept as documentation.
    diag_every: int = 1          # stability-diagnostic cadence (steps) in
    #                              the fast on-device span path (run_fast /
    #                              run_span). Default 1 = the reference's
    #                              per-step cadence (speedy.f90:41), so
    #                              "guard-clean" stability claims sample
    #                              EVERY step. Benchmarks opt into 3
    #                              explicitly (per-triple extrema; the
    #                              per-step diagnostic chain costs ~13.5%
    #                              of the latency-bound step, measured r04,
    #                              scripts/bench_step_variants.py). Must
    #                              divide nstrad.
    fuse_physics: Optional[bool] = None  # run the whole column-physics
    #                              chain as ONE Pallas VPU kernel over
    #                              latitude tiles (physics/fused.py)
    #                              instead of ~700 XLA mini-kernels
    #                              (+60% ensemble throughput, r05). Same
    #                              arithmetic: the kernel calls
    #                              grid_physics_core, the single source
    #                              of truth. None (default) = auto: ON
    #                              for accelerator backends, OFF on CPU
    #                              (Pallas interpret mode is for tests,
    #                              not production CPU runs). True/False
    #                              force either path. Gated by the
    #                              90-day stability matrix like every
    #                              compile change (BASELINE.md r05).
    lw_band_vectorized: bool = True  # band-axis-vectorized LW sweeps
    #                              (longwave.py *_vec; 1.3% step win,
    #                              parity-green). Reverted in r04 when it
    #                              exposed the T85 stability cliff
    #                              (day-34-48 blowups, commit 6758aa7);
    #                              RE-LANDED in r05 after the
    #                              investigation (docs/STABILITY.md)
    #                              found the mechanism — under-damped
    #                              stretch presets, not this change —
    #                              and the resolution-scaled damping
    #                              defaults hold 360-day T85 and 90-day
    #                              T170 runs clean with it on. False
    #                              restores the reference sweep order.
    allow_unstable: bool = False  # escape hatch for knobs documented
    #                              unstable on TPU (synthesis_split);
    #                              Model.__init__ refuses them otherwise.

    # ---- derived geometry ----
    @property
    def iy(self) -> int:
        return self.il // 2

    @property
    def mx(self) -> int:
        return self.trunc + 1

    @property
    def nx(self) -> int:
        return self.trunc + 2

    @property
    def delt(self) -> float:
        """Time step in seconds (params.f90:31)."""
        return 86400.0 / self.nsteps

    # ---- dtype policy (replaces source/types.f90) ----
    @property
    def rdtype(self):
        return jnp.float64 if self.precision == "fp64" else jnp.float32

    @property
    def cdtype(self):
        return jnp.complex128 if self.precision == "fp64" else jnp.complex64

    def validate(self) -> "ModelConfig":
        assert self.il % 2 == 0, "il must be even (two hemispheres)"
        assert self.kx in (5, 7, 8), "sigma-level tables exist for kx in {5,7,8}"
        assert self.ix >= 2 * self.mx, "longitudes must resolve all zonal modes"
        return self


def t30(**kw) -> ModelConfig:
    """Default reference resolution: T30, 96x48, 8 levels."""
    return ModelConfig(**kw).validate()


def t85(**kw) -> ModelConfig:
    """High-resolution stretch preset: T85, 256x128, 8 levels.

    Runs off the T30 boundary files via bilinear regridding
    (utils/io.regrid_latlon) when no native-resolution files are provided.
    nsteps=96 (dt=900 s) keeps the leapfrog advectively stable at the
    ~156 km equatorial grid spacing (the reference's 2400 s is T30-only).

    Damping times are resolution-scaled (halved vs the reference's
    T30-tuned 2.4 h) after the r05 stability investigation
    (docs/STABILITY.md): with the T30 values, T85 fp32 sits at a
    stability cliff where parity-green compile-roundoff changes (LW band
    vectorization, f32-vs-bf16 matmuls) flip 90-day runs into day-35-50
    blowups; with thd/thdd = 1.2 h the same binaries run 360 days clean.
    T42/T63 interpolate the measured T30/T85/T170 anchors
    (thd ~ 2.4 * (30/trunc)^0.67).
    """
    kw.setdefault("trunc", 85)
    kw.setdefault("ix", 256)
    kw.setdefault("il", 128)
    kw.setdefault("nsteps", 96)
    kw.setdefault("thd", 1.2)
    kw.setdefault("thdd", 1.2)
    kw.setdefault("thds", 6.0)
    return ModelConfig(**kw).validate()


def t42(**kw) -> ModelConfig:
    """Intermediate preset: T42, 128x64, 8 levels (dt=1200 s).

    Boundary files are regridded from the T30 set like the t85 preset."""
    kw.setdefault("trunc", 42)
    kw.setdefault("ix", 128)
    kw.setdefault("il", 64)
    kw.setdefault("nsteps", 72)
    kw.setdefault("thd", 1.9)
    kw.setdefault("thdd", 1.9)
    kw.setdefault("thds", 9.5)
    return ModelConfig(**kw).validate()


def t63(**kw) -> ModelConfig:
    """Intermediate preset: T63, 192x96, 8 levels (dt=960 s)."""
    kw.setdefault("trunc", 63)
    kw.setdefault("ix", 192)
    kw.setdefault("il", 96)
    kw.setdefault("nsteps", 90)
    kw.setdefault("thd", 1.45)
    kw.setdefault("thdd", 1.45)
    kw.setdefault("thds", 7.25)
    return ModelConfig(**kw).validate()


def t170(**kw) -> ModelConfig:
    """North-star stretch preset: T170, 512x256, 8 levels (dt=240 s).

    The scale where sharded-Legendre tensor parallelism pays off: the cpol
    tables are ~40x T30 and the transform einsums fill full MXU tiles
    (BASELINE.json north_star "T85/T170"; reference scale hook:
    source/params.f90:19-27 + legendre.f90:74-155). Boundary files are
    regridded from the T30 set like the other presets.

    dt and diffusion, all measured (r04): linear 1/trunc scaling of the
    reference's T30 2400 s gives ~424 s, but dt=450/400 s blow up
    mid-day-5 of spin-up (sudden grid-point storm; identical with
    float32 matmuls — not precision). dt=300 s survives 30 days but the
    90-day horizon then fails around day 39-55 across compile variants
    with the T30-tuned thd=2.4 h damping (weeks-scale growth, not
    advective CFL). Quartering the damping times (standard resolution
    scaling at a 5.7x finer truncation) plus dt=240 s (nsteps=360)
    holds 90-day runs guard-clean.

    rob=0.1 (r05): even with the quartered damping, T170's margin is
    thinner than the other presets' — one fused-compile variant died at
    day ~55 of a 180-day run while the 90-day gate passed (the
    probabilistic cliff of docs/STABILITY.md). Doubling the Robert
    filter (0.05 -> 0.1, still in the standard leapfrog range) holds
    180 days clean at this compile, as does a further damping halving;
    the filter is preferred because it targets the leapfrog
    computational mode and leaves the resolved small scales — and the
    T170 jet-bias improvement (docs/CLIMATOLOGY.md) — untouched.
    """
    kw.setdefault("trunc", 170)
    kw.setdefault("ix", 512)
    kw.setdefault("il", 256)
    kw.setdefault("nsteps", 360)
    kw.setdefault("thd", 0.6)
    kw.setdefault("thdd", 0.6)
    kw.setdefault("thds", 3.0)
    kw.setdefault("rob", 0.1)
    return ModelConfig(**kw).validate()


PRESETS = {"t30": t30, "t42": t42, "t63": t63, "t85": t85, "t170": t170}


def from_preset(name: str, **kw) -> ModelConfig:
    return PRESETS[name.lower()](**kw)
