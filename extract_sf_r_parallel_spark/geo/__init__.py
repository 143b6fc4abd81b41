from . import kernels, index  # noqa: F401
