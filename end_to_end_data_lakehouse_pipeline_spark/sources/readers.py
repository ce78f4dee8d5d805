"""Schema-first batch readers (S10 analog, load_kaggle_data.py:150-244).

The reference bulk-loads CSVs with pandas + psycopg2 batches; Spark-first
that is a distributed ``spark.read`` with an EXPLICIT schema — never
inferSchema on the hot path (inference reads the data twice and guesses
types the oracle then disagrees with).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return spark.read.csv(path, schema=schema, header=header, **options)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    return spark.read.schema(schema).json(path, **options)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv_bulk(
    df: DataFrame,
    path: str,
    n_files: int | None = None,
    header: bool = True,
    **options: str,
) -> None:
    """S11 analog (generate_large_data.py:226-236): the reference emits
    10 GB of synthetic CSV through a batched single-process writer;
    Spark-first that is a partitioned distributed ``df.write.csv`` — one
    file per task, linear scale-out. ``n_files`` sizes the output files
    (target ~100-500 MB each at scale); left None the input partitioning
    is kept. Round-trips type-faithfully with read_csv + the same
    explicit schema (timestamps ISO-8601 by default)."""
    if n_files is not None:
        df = df.repartition(n_files)
    df.write.mode("overwrite").option("header", str(header).lower()).options(
        **options
    ).csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC batch scan — columnar-format completeness next to parquet/CSV/
    JSON (vectorized reader, predicate pushdown and column pruning apply
    exactly as for parquet)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Distributed ORC writer (overwrite). ``n_files`` sizes output files
    like write_csv_bulk."""
    if n_files is not None:
        df = df.repartition(n_files)
    df.write.mode("overwrite").orc(path)
