from . import relational, spatial_queries, textops, registry  # noqa: F401
