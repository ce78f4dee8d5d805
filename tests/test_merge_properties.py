"""Property-based check: merge_upsert == a sequential per-batch fold model.

For ANY sequence of CDC events (insert/update/delete, colliding
timestamps, any batch split point), merging batch-by-batch must equal the
model: resolve each batch to its per-key winner, then a winner replaces
table state iff its order key is >= the current row's (updates beat
current on ties); a winning delete removes the row physically (the
reference's silver semantics, batch_silver.py:107-115 — note this means a
stale update arriving AFTER the delete's batch resurrects the key; Delta
CDF tombstones are the production fix, documented in sources/lakehouse).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_data_lakehouse_pipeline_spark.sources.lakehouse import merge_upsert

KEYS = ["k1", "k2", "k3"]

event = st.tuples(
    st.sampled_from(KEYS),                   # pk
    st.integers(min_value=0, max_value=4),   # ts (small range forces ties)
    st.sampled_from(["c", "u", "d"]),        # op
    st.integers(min_value=0, max_value=99),  # payload
)


def _fold_model(batches):
    state: dict[str, tuple[int, bool, int]] = {}  # pk -> (ts, deleted, payload)
    for batch in batches:
        winners: dict[str, tuple[int, bool, int]] = {}
        for pk, ts, deleted, payload in batch:
            if pk not in winners or ts >= winners[pk][0]:
                winners[pk] = (ts, deleted, payload)
        for pk, row in winners.items():
            cur = state.get(pk)
            if cur is None or row[0] >= cur[0]:  # ties: update beats current
                if row[1]:
                    state.pop(pk, None)
                else:
                    state[pk] = row
    return {pk: (ts, payload) for pk, (ts, deleted, payload) in state.items()}


@given(st.lists(event, min_size=0, max_size=12), st.integers(min_value=0, max_value=12))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_batchwise_merge_equals_fold_model(spark, events, split):
    split = min(split, len(events))
    # encode a unique order key per event WITHIN a batch (ts*100+seq) so
    # batch-local winners are deterministic; cross-batch ties on equal raw
    # ts stay possible via different seq — matching real CDC streams.
    raw_batches = [events[:split], events[split:]]
    batches = [
        [(pk, ts * 100 + seq, op == "d", payload) for seq, (pk, ts, op, payload) in enumerate(b)]
        for b in raw_batches
        if b
    ]

    current = None
    for batch in batches:
        updates = spark.createDataFrame(batch, ["pk", "ts", "_deleted", "payload"])
        current = merge_upsert(current, updates, pks=["pk"], order_col="ts")

    got = {} if current is None else {r.pk: (r.ts, r.payload) for r in current.collect()}
    assert got == _fold_model(batches)
