"""Date/time helpers with warehouse-parity semantics.

The reference's warehouse SQL uses ClickHouse date functions
(clickhouse_init/02_dim_tables.sql:29-60, 04_materialized_views.sql:16-122).
Two gaps vs Spark built-ins, fixed here:

- ClickHouse ``toDayOfWeek`` is 1=Monday; Spark ``dayofweek`` is 1=Sunday.
  Use :func:`isodow` (= ``weekday()+1``; DuckDB equivalent: ``isodow``).
- ClickHouse ``toYYYYMM`` returns a number; we keep the string form
  ``date_format(ts, 'yyyyMM')`` cast to int for parity with both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def isodow(col: Column | str) -> Column:
    """ISO day of week: 1=Monday .. 7=Sunday (ClickHouse toDayOfWeek parity)."""
    return (F.weekday(col) + F.lit(1)).cast("int")


def yyyymm(col: Column | str) -> Column:
    """Numeric year-month key, e.g. 199801 (ClickHouse toYYYYMM parity)."""
    return F.date_format(col, "yyyyMM").cast("int")


def date_key(col: Column | str) -> Column:
    """Numeric yyyyMMdd surrogate date key (load_warehouse.py:205 pattern)."""
    return F.date_format(col, "yyyyMMdd").cast("int")
