"""LakeCatalog: named txnlog tables + the catalog.sql entry point."""

import pytest

from end_to_end_data_lakehouse_pipeline_spark.sources.lake_catalog import (
    LakeCatalog,
)


def _mk(spark, rows, cols=("k", "v", "updated_at")):
    return spark.createDataFrame(rows, list(cols))


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, str(tmp_path / "lake"))
    c.create("t", _mk(spark, [(i, f"v{i}", 1) for i in range(10)]), stats_cols=("k",))
    return c


def test_create_table_list_drop(spark, cat):
    assert cat.tables() == ["t"]
    cat.create("u", _mk(spark, [(1, "a", 1)]))
    assert cat.tables() == ["t", "u"]
    with pytest.raises(ValueError):
        cat.create("t")  # already exists
    cat.drop("u")
    assert cat.tables() == ["t"]
    with pytest.raises(FileNotFoundError):
        cat.table("u")


def test_sql_select_and_dml_route(spark, cat):
    assert cat.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 10
    v = cat.sql("DELETE FROM t WHERE k >= 8")
    assert isinstance(v, int) and v == cat.table("t").latest_version()
    assert cat.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 8
    cat.sql("INSERT INTO t VALUES (100, 'x', 2)")
    got = {r.k for r in cat.sql("SELECT k FROM t").collect()}
    assert 100 in got and 9 not in got


def test_sql_version_as_of_time_travel(spark, cat):
    cat.sql("UPDATE t SET v = 'NEW' WHERE k = 0")
    now = cat.sql("SELECT v FROM t WHERE k = 0").collect()[0].v
    old = cat.sql("SELECT v FROM t VERSION AS OF 1 WHERE k = 0").collect()[0].v
    assert (now, old) == ("NEW", "v0")


def test_fresh_instance_infers_stats_cols_from_log(spark, cat, tmp_path):
    # a NEW catalog (new process analog) must keep writing k-stats so
    # file-level merges stay pruned — the log is the only metadata store
    fresh = LakeCatalog(spark, str(tmp_path / "lake"))
    t = fresh.table("t")
    assert t.stats_cols == ("k",)
    t.append(_mk(spark, [(500, "late", 1)]), sort_by=["k"])
    snap = t.snapshot()
    newest = max(snap.items(), key=lambda kv: kv[1].get("bytes", 0))
    assert any("k" in e.get("stats", {}) for e in snap.values())


def test_invalid_names_rejected(spark, cat):
    for bad in ("../escape", "a b", "x;y"):
        with pytest.raises(ValueError):
            cat.create(bad)


def test_sql_create_table_as_and_drop(spark, cat):
    v = cat.sql(
        "CREATE TABLE big STATS ON (k) AS SELECT k, v FROM t WHERE k >= 5"
    )
    assert v == 1 and "big" in cat.tables()
    assert cat.sql("SELECT COUNT(*) AS n FROM big").collect()[0].n == 5
    # inferred stats power file-level ops on the new table
    assert cat.table("big").stats_cols == ("k",)
    cat.sql("DELETE FROM big WHERE k = 5")
    assert cat.sql("SELECT COUNT(*) AS n FROM big").collect()[0].n == 4
    with pytest.raises(ValueError):
        cat.sql("CREATE TABLE big AS SELECT 1")  # duplicate via create()
    cat.sql("DROP TABLE big")
    assert "big" not in cat.tables()
    cat.sql("DROP TABLE IF EXISTS big")  # no-op
    with pytest.raises(FileNotFoundError):
        cat.sql("DROP TABLE big")


def test_alter_table_add_column_sql(spark, cat):
    # metadata-only evolution: new column visible as typed NULL immediately
    v = cat.sql("ALTER TABLE t ADD COLUMN tier STRING")
    assert isinstance(v, int) and v == cat.table("t").latest_version()
    rows = cat.sql("SELECT k, tier FROM t").collect()
    assert len(rows) == 10 and all(r.tier is None for r in rows)
    # post-evolution append carries the column; old files NULL-fill
    cat.sql("INSERT INTO t VALUES (200, 'x', 3, 'gold')")
    got = {r.k: r.tier for r in cat.sql("SELECT k, tier FROM t").collect()}
    assert got[200] == "gold" and got[0] is None
    # time travel to pre-ALTER version serves the old schema
    pre = cat.sql("SELECT * FROM t VERSION AS OF 1")
    assert "tier" not in pre.columns


def test_alter_table_rejects_duplicates_and_bad_sql(spark, cat):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cat.sql("ALTER TABLE t ADD COLUMN k BIGINT")  # exists
    with _pytest.raises(FileNotFoundError):
        cat.sql("ALTER TABLE nope ADD COLUMN x INT")
    with _pytest.raises(ValueError):
        cat.sql("ALTER TABLE t DROP COLUMN v")  # unsupported shape


def test_alter_multi_columns_parenthesized(spark, cat):
    cat.sql("ALTER TABLE t ADD COLUMNS (score DOUBLE, n INT)")
    row = cat.sql("SELECT score, n FROM t WHERE k = 0").collect()[0]
    assert row.score is None and row.n is None
    schema = dict(cat.sql("SELECT * FROM t").dtypes)
    assert schema["score"] == "double" and schema["n"] == "int"


def test_sql_optimize_vacuum_describe_history(spark, cat, tmp_path):
    # accumulate small files via single-row inserts
    for i in range(3):
        cat.sql(f"INSERT INTO t VALUES ({300 + i}, 'opt', {i})")
    before = cat.sql("SELECT k, v FROM t").collect()
    n_files_before = len(cat.table("t").snapshot())
    v = cat.sql("OPTIMIZE t")
    assert isinstance(v, int) and v == cat.table("t").latest_version()
    assert len(cat.table("t").snapshot()) < n_files_before
    after = cat.sql("SELECT k, v FROM t").collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    # vacuum with 0-hour retention removes the unreferenced pre-compaction files
    removed = cat.sql("VACUUM t RETAIN 0 HOURS")
    assert isinstance(removed, int) and removed >= 1
    # post-vacuum current snapshot still reads clean
    assert len(cat.sql("SELECT k FROM t").collect()) == len(after)
    hist = cat.sql("DESCRIBE HISTORY t")
    ops = [r.operation for r in hist.collect()]
    assert "optimize" in ops and ops[0] == "append"
    assert hist.columns == ["version", "operation", "ts"]


def test_sql_maintenance_errors(spark, cat):
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        cat.sql("OPTIMIZE missing")
    with _pytest.raises(ValueError):
        cat.sql("DESCRIBE EXTENDED t")
    # DESCRIBE DETAIL serves the live file inventory from log metadata
    det = cat.sql("DESCRIBE DETAIL t")
    assert det.columns == ["file", "bytes", "stats"]
    assert det.count() == len(cat.table("t").snapshot())


def test_check_constraints_end_to_end(spark, cat):
    import pytest as _pytest

    from end_to_end_data_lakehouse_pipeline_spark.sources.txnlog import (
        ConstraintViolation,
    )

    v = cat.sql("ALTER TABLE t ADD CONSTRAINT k_nonneg CHECK (k >= 0)")
    assert v == cat.table("t").latest_version()
    assert cat.table("t").constraints() == {"k_nonneg": "k >= 0"}
    # good write passes, violating write is rejected BEFORE any commit
    cat.sql("INSERT INTO t VALUES (500, 'ok', 9)")
    ver_before = cat.table("t").latest_version()
    with _pytest.raises(ConstraintViolation):
        cat.sql("INSERT INTO t VALUES (-1, 'bad', 9)")
    assert cat.table("t").latest_version() == ver_before
    assert -1 not in {r.k for r in cat.sql("SELECT k FROM t").collect()}
    # UPDATE that would break the constraint is rejected too
    with _pytest.raises(ConstraintViolation):
        cat.sql("UPDATE t SET k = -5 WHERE k = 500")
    # constraint is discoverable by a FRESH catalog instance (log = metadata)
    from end_to_end_data_lakehouse_pipeline_spark.sources.lake_catalog import (
        LakeCatalog,
    )

    fresh = LakeCatalog(spark, cat.root)
    assert fresh.table("t").constraints() == {"k_nonneg": "k >= 0"}
    # adding a constraint existing rows violate is refused
    with _pytest.raises(ConstraintViolation):
        cat.sql("ALTER TABLE t ADD CONSTRAINT k_small CHECK (k < 10)")
    # drop, then the bad write goes through
    cat.sql("ALTER TABLE t DROP CONSTRAINT k_nonneg")
    assert cat.table("t").constraints() == {}
    cat.sql("INSERT INTO t VALUES (-1, 'now ok', 9)")
    assert -1 in {r.k for r in cat.sql("SELECT k FROM t").collect()}


def test_catalog_dml_sources_see_fresh_snapshots(spark, cat):
    """ADVICE r4 low: a MERGE whose source is ANOTHER catalog table must
    read that table's CURRENT snapshot — temp views registered by an
    earlier read-path call pin the snapshot as of registration."""
    cat.create("s", _mk(spark, [(5, "STALE", 9)]), stats_cols=("k",))
    cat.sql("SELECT * FROM s").collect()  # registers (and pins) views
    cat.sql("UPDATE s SET v = 'FRESH' WHERE k = 5")  # mutate after pin
    cat.sql(
        "MERGE INTO t USING s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v"
    )
    got = {r.k: r.v for r in cat.sql("SELECT * FROM t").collect()}
    assert got[5] == "FRESH"


def test_drop_table_unregisters_temp_view(spark, cat):
    """ADVICE r4 low: DROP TABLE must drop the table's temp view too —
    a leftover view would keep serving the dropped table's last
    snapshot to later spark.sql reads."""
    cat.create("gone", _mk(spark, [(1, "x", 1)]))
    cat.sql("SELECT * FROM gone").collect()  # registers the view
    cat.sql("DROP TABLE gone")
    assert "gone" not in [v.name for v in spark.catalog.listTables()]


def test_catalog_sql_reads_get_pushdown_file_skipping(spark, tmp_path):
    """VERDICT r4 task 3: catalog reads auto-inject txnlog stats
    pushdown — a point/range predicate through catalog.sql plans only
    the stats-matching files, no option incantation from the user."""
    from pyspark.sql import functions as F

    c = LakeCatalog(spark, str(tmp_path / "lakep"))
    t = c.create("p", stats_cols=("k",))
    t.append(
        spark.range(0, 8000).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("v")
        ),
        sort_by=["k"],
        n_files=8,
    )
    full = c.sql("SELECT * FROM p")
    assert full.rdd.getNumPartitions() == 8
    point = c.sql("SELECT * FROM p WHERE k = 42")
    assert point.rdd.getNumPartitions() == 1
    assert [(r.k, r.v) for r in point.collect()] == [(42, 2)]
    rng = c.sql("SELECT * FROM p WHERE k >= 7000")
    assert rng.rdd.getNumPartitions() == 1
    assert rng.count() == 1000
    # opting out restores the native-parquet view path
    c2 = LakeCatalog(spark, str(tmp_path / "lakep"), pushdown=False)
    assert sorted(
        map(tuple, c2.sql("SELECT * FROM p WHERE k = 42").collect())
    ) == [(42, 2)]
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_create_table_with_explicit_schema(spark, cat):
    """CREATE TABLE <name> (cols) — the non-CTAS shape (VERDICT r4
    missing #4): version-1 schema-only commit; reads serve the empty
    declared schema, INSERT/MERGE then populate it."""
    v = cat.sql("CREATE TABLE w (k BIGINT, v STRING, updated_at BIGINT) STATS ON (k)")
    assert v == 1 and "w" in cat.tables()
    empty = cat.sql("SELECT * FROM w")
    assert empty.columns == ["k", "v", "updated_at"] and empty.count() == 0
    cat.sql("INSERT INTO w VALUES (1, 'a', 1), (2, 'b', 1)")
    cat.sql(
        "MERGE INTO w USING (SELECT 2 AS k, 'B' AS v, 2 AS updated_at) AS s "
        "ON w.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v, updated_at = s.updated_at "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r.k: r.v for r in cat.sql("SELECT * FROM w").collect()}
    assert got == {1: "a", 2: "B"}
    with pytest.raises(ValueError):
        cat.sql("CREATE TABLE w (k BIGINT)")  # already exists


def test_restore_to_version(spark, cat):
    """RESTORE rolls the live set AND declared schema back via a NEW
    commit — history is preserved, so the pre-restore state stays
    time-travelable and the restore itself is restorable."""
    t = cat.table("t")
    v1 = t.latest_version()
    cat.sql("DELETE FROM t WHERE k >= 5")
    cat.sql("ALTER TABLE t ADD COLUMNS (extra BIGINT)")
    cat.sql("INSERT INTO t VALUES (200, 'x', 2, 7)")
    assert cat.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 6
    rv = cat.sql(f"RESTORE TABLE t TO VERSION AS OF {v1}")
    assert rv == cat.table("t").latest_version()
    out = cat.sql("SELECT * FROM t")
    assert out.columns == ["k", "v", "updated_at"]  # schema rolled back
    assert sorted(r.k for r in out.collect()) == list(range(10))
    # the undone state is still reachable, and the restore is undoable
    assert (
        cat.sql(f"SELECT COUNT(*) AS n FROM t VERSION AS OF {rv - 1}")
        .collect()[0]
        .n
        == 6
    )
    cat.sql(f"RESTORE TABLE t TO VERSION AS OF {rv - 1}")
    assert cat.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 6
    with pytest.raises(ValueError):
        cat.table("t").restore(99)


def test_timestamp_as_of_read_and_restore(spark, cat):
    t = cat.table("t")
    ts_after_v1 = max(float(h["ts"]) for h in t.history()) + 0.001
    cat.sql("DELETE FROM t WHERE k >= 5")
    n = (
        cat.sql(f"SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF {ts_after_v1}")
        .collect()[0]
        .n
    )
    assert n == 10  # pinned to the pre-delete commit
    assert cat.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 5
    cat.sql(f"RESTORE TABLE t TO TIMESTAMP AS OF {ts_after_v1}")
    assert cat.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 10
    # ISO-string literal resolves too (UTC)
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(ts_after_v1, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.%f"
    )
    assert (
        cat.sql(f"SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF '{iso}'")
        .collect()[0]
        .n
        == 10
    )


def test_shallow_clone(spark, cat, tmp_path):
    """Zero-copy clone: hard-linked files, stats/schema/constraints
    carried; writes after the clone diverge the two logs."""
    import os

    cat.sql("ALTER TABLE t ADD CONSTRAINT k_pos CHECK (k >= 0)")
    cat.sql("CREATE TABLE t2 SHALLOW CLONE t")
    assert sorted(cat.tables()) == ["t", "t2"]
    assert cat.sql("SELECT COUNT(*) AS n FROM t2").collect()[0].n == 10
    t, t2 = cat.table("t"), cat.table("t2")
    # same file names, hard-linked bytes (same inode), stats carried
    assert set(t.snapshot()) == set(t2.snapshot())
    for n in t2.snapshot():
        assert os.path.samefile(
            os.path.join(t.path, n), os.path.join(t2.path, n)
        )
        assert t2.snapshot()[n].get("stats") == t.snapshot()[n].get("stats")
    assert t2.constraints() == {"k_pos": "k >= 0"}
    # diverge: write to the clone, source unchanged; constraint enforced
    cat.sql("INSERT INTO t2 VALUES (300, 'c', 3)")
    assert cat.sql("SELECT COUNT(*) AS n FROM t2").collect()[0].n == 11
    assert cat.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 10
    from end_to_end_data_lakehouse_pipeline_spark.sources.txnlog import (
        ConstraintViolation,
    )

    with pytest.raises(ConstraintViolation):
        cat.sql("INSERT INTO t2 VALUES (-1, 'bad', 3)")
    # VERSION AS OF clone pins an older snapshot
    cat.sql("DELETE FROM t WHERE k >= 5")
    cat.sql("CREATE TABLE t3 SHALLOW CLONE t VERSION AS OF 1")
    assert cat.sql("SELECT COUNT(*) AS n FROM t3").collect()[0].n == 10
    with pytest.raises(ValueError):
        cat.clone("t", "t2")  # dst exists


def test_show_tables_describe_table_changes(spark, cat):
    assert [r.tableName for r in cat.sql("SHOW TABLES").collect()] == ["t"]
    desc = {r.col_name: r.data_type for r in cat.sql("DESCRIBE TABLE t").collect()}
    assert desc == {"k": "bigint", "v": "string", "updated_at": "bigint"}
    # CDF through SQL: net changes between snapshot 1 and head
    cat.sql("DELETE FROM t WHERE k = 3")
    cat.sql("INSERT INTO t VALUES (400, 'n', 2)")
    ch = cat.sql(
        "SELECT _change_type, k FROM TABLE_CHANGES(t, 1) ORDER BY k"
    ).collect()
    got = {(r._change_type, r.k) for r in ch}
    assert got == {("delete", 3), ("insert", 400)}
    # bounded upper version: nothing changed between head and head
    head = cat.table("t").latest_version()
    assert (
        cat.sql(f"SELECT COUNT(*) AS n FROM TABLE_CHANGES(t, {head}, {head})")
        .collect()[0]
        .n
        == 0
    )
    with pytest.raises(ValueError):
        cat.sql("SHOW PARTITIONS t")


def test_optimize_zorder_by(spark, cat):
    """OPTIMIZE ... ZORDER BY (a, b): whole-table Morton re-cluster
    through the SQL route; content identical, later reads prune on
    EITHER key via the re-harvested per-file stats."""
    t = cat.table("t")
    before = sorted((r.k, r.v, r.updated_at) for r in t.read().collect())
    # split into several files so there is something to re-cluster
    cat.sql("INSERT INTO t VALUES (20, 'w', 5), (21, 'x', 6)")
    v = cat.sql("OPTIMIZE t ZORDER BY (k, updated_at)")
    assert v == cat.table("t").latest_version()
    after = sorted((r.k, r.v, r.updated_at) for r in cat.table("t").read().collect())
    assert after == sorted(before + [(20, "w", 5), (21, "x", 6)])
    # every live file carries fresh stats on both z-keys
    for e in cat.table("t").snapshot().values():
        assert "k" in e.get("stats", {}) and "updated_at" in e.get("stats", {})


def test_register_views_bounded_to_referenced_tables(spark, cat, monkeypatch):
    """A statement plans snapshot views only for the tables it names —
    O(#referenced), not O(#tables) (a 1000-table catalog must not re-plan
    999 unrelated snapshots per statement)."""
    cat.create("other_a", _mk(spark, [(1, "a", 1)]))
    cat.create("other_b", _mk(spark, [(2, "b", 1)]))
    planned: list[str] = []
    orig = LakeCatalog._snapshot_df

    def spy(self, name, version=None):
        planned.append(name)
        return orig(self, name, version)

    monkeypatch.setattr(LakeCatalog, "_snapshot_df", spy)
    assert cat.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 10
    assert planned == ["t"]
    planned.clear()
    cat.sql("INSERT INTO other_a SELECT k, v, updated_at FROM t WHERE k < 2")
    assert sorted(set(planned)) == ["other_a", "t"]
    assert "other_b" not in planned
    # a MERGE naming two tables registers exactly those two
    planned.clear()
    cat.sql(
        "MERGE INTO other_b AS tgt USING other_a AS src ON tgt.k = src.k "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert "other_a" in set(planned) and "t" not in planned
