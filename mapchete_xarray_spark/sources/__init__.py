from . import aoi, images, pyramid  # noqa: F401
