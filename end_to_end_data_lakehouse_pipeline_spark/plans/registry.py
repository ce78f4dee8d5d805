"""Query registry: every public query = Spark callable + DuckDB oracle SQL.

This is the engine's declared query surface (SURVEY.md §2 inventory plus the
LLM-data-pipeline extensions). Each entry is differential-tested: the driver
runs the Spark callable and the oracle SQL side-by-side on the same parquet
tables and compares row count + schema + order-insensitive value hash.

Conventions that keep the two sides hash-identical:

- **Alias everything.** Every computed/aggregate column carries the same
  explicit name in the Spark plan and the oracle SQL.
- **Round floating aggregates** (``ROUND(x, 2)`` money / ``ROUND(x, 6)``
  ratios) on BOTH sides — double sums are order-sensitive in the last bits;
  rounding makes the parallel Spark sum and the sequential DuckDB sum equal.
- **Deterministic winners.** No bare ``first()`` / ``dropDuplicates``:
  every per-group winner is picked by a total order (window row_number with
  unique tie-break, or min_by on a unique key).
- **Type parity.** DuckDB wide types are cast down to Spark's (``year()``
  BIGINT→INT, integer ``SUM`` HUGEINT→BIGINT, DECIMAL aggregates→DOUBLE).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over views named as in catalog.TABLES
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tuple(tags))
        return fn

    return deco


def specs() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}
