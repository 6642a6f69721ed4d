from . import portable, tiling  # noqa: F401
