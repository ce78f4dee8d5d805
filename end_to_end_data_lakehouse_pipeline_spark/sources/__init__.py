"""Batch IO + lakehouse write path (reference: spark/streaming_bronze.py
sinks, spark/batch_silver.py MERGE, scripts/load_kaggle_data.py CSV load)."""

from .cdc import CDC_ENVELOPE_SCHEMA, parse_cdc_envelope  # noqa: F401
from .lakehouse import LakehouseTable, merge_upsert  # noqa: F401
from .readers import read_csv, read_json, read_parquet  # noqa: F401
