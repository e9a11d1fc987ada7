from . import spectral  # noqa: F401
