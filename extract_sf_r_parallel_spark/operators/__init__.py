from . import areadist, range_join  # noqa: F401
