from . import agg, dedup, knn, neighbors, spatial, text  # noqa: F401
