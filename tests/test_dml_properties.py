"""Model-based property test for the SQL MERGE surface (sources/dml.py):
for random target/source data, the canonical guarded 3-clause MERGE
through execute_dml must equal a per-row Python fold of SQL MERGE
semantics. This is the statement-level analog of
test_merge_properties.py's merge_upsert model test — it exercises the
parser, the generic WHEN-clause executor, the stats-pruned candidate
selection, and the commit path on every example."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_data_lakehouse_pipeline_spark.sources.dml import execute_dml
from end_to_end_data_lakehouse_pipeline_spark.sources.txnlog import (
    TransactionLogTable,
)

# (k, v, flag): k in a small domain so matched/unmatched/deleted overlap
target_row = st.tuples(
    st.integers(min_value=0, max_value=15), st.text("ab", min_size=1, max_size=3)
)
source_row = st.tuples(
    st.integers(min_value=0, max_value=15),
    st.text("xy", min_size=1, max_size=3),
    st.booleans(),
)

MERGE_SQL = """MERGE INTO t USING s ON t.k = s.k
WHEN MATCHED AND s.flag THEN DELETE
WHEN MATCHED THEN UPDATE SET v = s.v
WHEN NOT MATCHED AND NOT s.flag THEN INSERT (k, v) VALUES (s.k, s.v)"""


def _model(target: dict[int, str], source: dict[int, tuple[str, bool]]):
    out = dict(target)
    for k, (v, flag) in source.items():
        if k in target:
            if flag:
                out.pop(k, None)
            else:
                out[k] = v
        elif not flag:
            out[k] = v
    return out


@given(
    st.lists(target_row, min_size=0, max_size=10, unique_by=lambda r: r[0]),
    st.lists(source_row, min_size=1, max_size=10, unique_by=lambda r: r[0]),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sql_merge_equals_row_model(spark, tmp_path_factory, target, source):
    base = tmp_path_factory.mktemp("dmlprop")
    t = TransactionLogTable(spark, str(base / "t"), stats_cols=("k",))
    if target:
        t.append(
            spark.createDataFrame(target, ["k", "v"]), sort_by=["k"]
        )
    else:
        # empty-but-committed table: schema from a row that is deleted
        t.append(spark.createDataFrame([(999999, "z")], ["k", "v"]))
        t.delete_where("k = 999999")
    src = spark.createDataFrame(source, ["k", "v", "flag"])
    execute_dml(spark, MERGE_SQL, tables={"t": t}, sources={"s": src})
    got = {r.k: r.v for r in t.read().collect()}
    assert got == _model(dict(target), {k: (v, f) for k, v, f in source})


def test_sql_merge_then_update_then_delete_compose(spark, tmp_path):
    """The three statement kinds compose on one table: each commit sees
    the previous statement's snapshot."""
    t = TransactionLogTable(spark, str(tmp_path / "c"), stats_cols=("k",))
    t.append(spark.createDataFrame([(i, "v") for i in range(6)], ["k", "v"]))
    execute_dml(
        spark,
        "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v",
        tables={"t": t},
        sources={"s": spark.createDataFrame([(2, "m")], ["k", "v"])},
    )
    execute_dml(spark, "UPDATE t SET v = upper(v) WHERE k >= 4", tables={"t": t})
    execute_dml(spark, "DELETE FROM t WHERE k = 0", tables={"t": t})
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "v", 2: "m", 3: "v", 4: "V", 5: "V"}
