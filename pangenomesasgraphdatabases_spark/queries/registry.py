"""Registry mapping query names -> (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md section 2 gets a registered query; the
driver hash-compares the Spark result against the oracle SQL at sf=0.01.
Column names are aliased identically on both sides (the driver sorts
columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver runs weaker rows-only check
    tags: tuple[str, ...] = ()


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Registry in driver-check order: PRIORITY names first (the driver
    gate checks the first 50 registered), then module order."""
    # Import side-effect modules lazily to avoid cycles.
    from pangenomesasgraphdatabases_spark.queries import PRIORITY, _load_all

    _load_all()
    ordered = {n: _REGISTRY[n] for n in PRIORITY if n in _REGISTRY}
    ordered.update({n: q for n, q in _REGISTRY.items() if n not in ordered})
    return ordered
