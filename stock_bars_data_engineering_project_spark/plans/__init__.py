from .registry import QUERIES, QuerySpec, get_queries, get_oracle_sql, register

# Importing the query modules populates the registry.
from . import parity  # noqa: E402,F401
from . import extensions  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import olap  # noqa: E402,F401
from . import maintenance  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "get_queries", "get_oracle_sql", "register"]
