"""Slowly-changing-dimension operators.

SCD Type-2 intervals from a change stream: collapse consecutive
same-value observations per key into ``[valid_from, valid_to)`` validity
runs with an ``is_current`` flag. This is the versioned extension of the
reference's silver latest-state-per-key pattern (spark/batch_silver.py
keeps only the newest row; SCD2 keeps the full history a warehouse
dimension needs).

One ``key`` partitioning end to end: change-detection (lag) -> run
numbering (cumulative sum) -> per-run collapse (groupBy on the same key)
-> interval close (lead). All four steps share the hash partitioning on
``key``, so the whole transform costs a single Exchange at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    changes: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    value: str,
    weight: str | None = None,
) -> DataFrame:
    """Collapse a (key, ts, value) change stream into SCD2 intervals.

    ``tiebreak`` must make (ts, tiebreak) a total order per key so run
    boundaries are deterministic. Output: key, <value>, valid_from,
    valid_to (null = open), n_events, is_current.

    ``weight``: optional per-row event count — a row produced by bronze
    run-compaction (streaming/scd2.py) stands for ``weight`` original
    events, so ``n_events`` sums weights instead of counting rows.
    """
    worder = Window.partitionBy(key).orderBy(ts, tiebreak)
    flagged = changes.withColumn(
        "_chg",
        F.when(
            F.lag(value).over(worder).isNull()
            | (F.lag(value).over(worder) != F.col(value)),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "_run_id",
        F.sum("_chg").over(worder.rowsBetween(Window.unboundedPreceding, 0)),
    )
    n_events = (
        F.sum(weight).cast("long") if weight else F.count(F.lit(1))
    ).alias("n_events")
    intervals = runs.groupBy(key, "_run_id").agg(
        F.min(value).alias(value),
        F.min(ts).alias("valid_from"),
        n_events,
    )
    wrun = Window.partitionBy(key).orderBy("_run_id")
    return intervals.select(
        key,
        value,
        "valid_from",
        F.lead("valid_from").over(wrun).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(wrun).isNull().alias("is_current"),
    )
