from . import areadist, dedup, knn, multimodal, range_join, similarity  # noqa: F401
