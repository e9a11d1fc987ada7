"""speedy_tpu: a TPU-native (JAX/XLA/Pallas) reimplementation of the SPEEDY
intermediate-complexity atmospheric general circulation model.

Brand-new framework with the capabilities of the reference Fortran model
samhatfield/speedy.f90 (hydrostatic sigma-coordinate spectral-transform AGCM,
T30 L8 by default), redesigned for TPUs: batched MXU Legendre transforms, XLA
FFTs, fully jitted semi-implicit leapfrog stepping, vmapped column physics,
ensemble vmap, and SPMD mesh sharding.
"""

__version__ = "0.1.0"

from .config import (ModelConfig, t30, t42, t63, t85, from_preset,  # noqa: F401
                     PRESETS)
