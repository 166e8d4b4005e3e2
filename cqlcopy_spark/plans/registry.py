"""Query registry: the single source of truth wiring operator implementations
to the driver contract (__spark_entry__.py).

Each operator module registers its public queries here with an optional
DuckDB oracle SQL string. ``queries()`` / ``oracle_sql()`` in
__spark_entry__.py are thin views over this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under `name`."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {q.name: q.fn for q in _REGISTRY.values()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every operator module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    import cqlcopy_spark.operators.relational  # noqa: F401
    import cqlcopy_spark.operators.tpch_deep  # noqa: F401
    import cqlcopy_spark.operators.tpch_full  # noqa: F401
    import cqlcopy_spark.operators.analytics  # noqa: F401
    import cqlcopy_spark.operators.temporal_joins  # noqa: F401
    import cqlcopy_spark.operators.copy_surface  # noqa: F401
    import cqlcopy_spark.operators.formats  # noqa: F401
    import cqlcopy_spark.operators.dedup  # noqa: F401
    import cqlcopy_spark.operators.similarity  # noqa: F401
    import cqlcopy_spark.operators.vector_index  # noqa: F401
    import cqlcopy_spark.operators.text  # noqa: F401
    import cqlcopy_spark.operators.timeseries  # noqa: F401
    import cqlcopy_spark.operators.behavior  # noqa: F401
    import cqlcopy_spark.operators.curation  # noqa: F401
    import cqlcopy_spark.operators.profiling  # noqa: F401
    import cqlcopy_spark.operators.graph  # noqa: F401
    import cqlcopy_spark.operators.multimodal  # noqa: F401
    import cqlcopy_spark.streaming.windows  # noqa: F401
    import cqlcopy_spark.streaming.stateful  # noqa: F401

    _LOADED = True
