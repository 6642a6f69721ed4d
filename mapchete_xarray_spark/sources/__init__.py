from . import aoi, images  # noqa: F401
