"""Structured Streaming layer (reference: spark/streaming_bronze.py).

Bronze CDC ingest (S1-S5), watermarked MV aggregation (the ST5 upgrade
over the reference, which resolves late data only in batch), and
streaming dedup (ST4 via dropDuplicatesWithinWatermark).
"""

from .bronze import fan_out, process_cdc_stream  # noqa: F401
from .aggregates import streaming_daily_sales, streaming_dedup  # noqa: F401
from .dedup_stream import incremental_dedup_sink  # noqa: F401
