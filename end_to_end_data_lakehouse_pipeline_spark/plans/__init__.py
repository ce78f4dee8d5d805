"""Query corpus. Importing this package registers every declared query
(with its DuckDB oracle) into :mod:`.registry`."""

from . import advanced, behavior, bpe, dedup, distribution, gold, mining, mlfit, mv, pipeline, quality, relational, runtime_filters, similarity, sketches, spans, sqlapi, star, connector_oracle, streaming_oracle, text, timeseries, tpch, txnlog_oracle  # noqa: F401
from .registry import oracles, queries, specs  # noqa: F401
