from . import ann, dedup, knn, mosaic, pip, skew  # noqa: F401
