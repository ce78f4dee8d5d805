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
