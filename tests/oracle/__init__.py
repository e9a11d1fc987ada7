"""Test-only, loop-literal NumPy transliteration of the Fortran reference
(/root/reference/source) used as an independent parity oracle. Not part of
the speedy_tpu package. See transforms.py header for scope and conventions."""
from .model import OracleSpeedy  # noqa: F401
