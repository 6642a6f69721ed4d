from . import aoi, audio, images, pyramid  # noqa: F401
