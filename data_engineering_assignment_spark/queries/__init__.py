"""Driver-facing query catalog: named queries + DuckDB oracle SQL.

Each catalog module registers queries with :func:`register`; the driver
contract (``__spark_entry__.py``) exposes ``REGISTRY`` as ``queries()`` /
``oracle_sql()``. Every query takes ``(spark, sf_dir)`` and returns a
DataFrame whose column names match its oracle exactly (the driver sorts
columns by name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""  # reference citation / operator coverage note


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_catalog() -> dict[str, Query]:
    """Import all catalog modules (side-effect: fills REGISTRY)."""
    from . import catalog_relational  # noqa: F401
    from . import catalog_arrays  # noqa: F401
    from . import catalog_text  # noqa: F401
    from . import catalog_events  # noqa: F401
    from . import catalog_intervals  # noqa: F401
    from . import catalog_ml  # noqa: F401
    from . import catalog_sources  # noqa: F401
    from . import catalog_llm  # noqa: F401
    from . import catalog_corpus  # noqa: F401
    from . import catalog_analytics  # noqa: F401

    return REGISTRY
