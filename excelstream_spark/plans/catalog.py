"""Query catalog: the single registry behind ``__spark_entry__.queries()``.

Every implemented operator registers here with
  - a Spark callable ``(spark, sf_dir) -> DataFrame`` (the implementation), and
  - optionally an ANSI-SQL oracle string DuckDB can evaluate over the same
    parquet tables (the correctness contract).

Column names are part of the contract: the driver sorts columns by name
before hashing values, so the Spark result and the oracle must use
identical aliases.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


CATALOG: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):  # decorator
    """Register a catalog query.  ``oracle=None`` marks ops that are not
    SQL-expressible (the driver falls back to a rows-only check)."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in CATALOG:
            raise ValueError(f"duplicate catalog query: {name}")
        CATALOG[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return wrap


def spark_queries() -> dict[str, SparkQuery]:
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_queries() -> dict[str, str]:
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None}
