"""k-means: determinism, assignment sanity, objective non-increase."""

from __future__ import annotations

from end_to_end_data_lakehouse_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def test_kmeans_deterministic_and_sane(spark):
    fn = plans.queries()["kmeans_embeddings"]
    a = {r.vec_id: (r.cluster, r.dist_sq) for r in fn(spark, SF).collect()}
    b = {r.vec_id: (r.cluster, r.dist_sq) for r in fn(spark, SF).collect()}
    assert a == b  # two full runs identical
    assert len(a) == 500  # every vector assigned exactly once
    clusters = {c for c, _ in a.values()}
    assert len(clusters) > 1  # actually partitioned the space
    assert all(d >= 0 for _, d in a.values())
