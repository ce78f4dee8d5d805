"""Streaming incremental dedup: foreachBatch batch-vs-corpus gate.

The streaming face of :func:`plans.dedup.incremental_dedup_from` — the
shape a production ingest pipeline runs: documents arrive as a stream,
each micro-batch is deduped against the persisted corpus, survivors are
appended to the corpus, and every match is recorded to an audit table.
The corpus only ever grows by deduped documents, so ordering within the
stream is the dedup tiebreak (first writer wins).

Scale notes: at 100 TB the corpus side would be a persisted, bucketed
shingle index (computed once per doc at admission — exactly what
``_prep`` produces) rather than re-derived per batch as this local
implementation does for simplicity; the join work per micro-batch is
batch-sized either way (see incremental_dedup_from's df-cap contract).

Reference parity: the reference's streaming layer stops at bronze append
(streaming_bronze.py); this extends the same foreachBatch machinery to
the LLM-pipeline admission-control use case.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.dedup import incremental_dedup_from, shingles_col
from ..plans.text import tokens_col


def _prep(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, text, fp, sh): the admission index row."""
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    return docs.select(
        "doc_id", "text", fp.alias("fp"), shingles_col(tokens_col()).alias("sh")
    )


def incremental_dedup_sink(
    doc_stream: DataFrame,
    corpus_path: str,
    matches_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Run the admission gate over a stream of (doc_id, text) rows.

    Per micro-batch: dedup the batch against the current corpus parquet;
    append non-matching docs to the corpus, matching docs (with their
    winning corpus doc, jaccard, exact/near class) to the audit table.
    """

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():  # empty-batch skip (same contract as bronze)
            return
        spark = batch_df.sparkSession
        batch = _prep(batch_df).filter(F.size("sh") > 0).cache()
        if os.path.exists(corpus_path):
            corpus = _prep(spark.read.parquet(corpus_path))
            matches = incremental_dedup_from(corpus, batch)
        else:
            matches = None
        if matches is not None:
            m = matches.cache()
            m.write.mode("append").parquet(matches_path)
            survivors = batch.join(
                m.select(F.col("batch_doc").alias("doc_id")), "doc_id", "left_anti"
            )
        else:
            survivors = batch
        survivors.select("doc_id", "text").write.mode("append").parquet(corpus_path)

    writer = (
        doc_stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.trigger(processingTime="5 seconds").start()
