from . import knn, pip, skew  # noqa: F401
