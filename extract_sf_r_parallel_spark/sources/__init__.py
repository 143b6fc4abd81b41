from . import lineage, tables  # noqa: F401
