"""DuckDB Python DataSource: schema inference, partitioned parallel
reads (JDBC semantics), filter pushdown, Arrow transport."""

import duckdb
import pytest
from pyspark.sql import functions as F

from end_to_end_data_lakehouse_pipeline_spark.sources.duckdb_source import (
    DuckDBDataSource,
)


@pytest.fixture(scope="module")
def duck_db(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("duck") / "t.duckdb")
    con = duckdb.connect(path)
    con.sql(
        """
        CREATE TABLE items AS
        SELECT i AS id,
               CASE WHEN i % 10 = 0 THEN NULL ELSE 'name_' || i END AS name,
               (i * 7) % 100 AS score,
               CAST(DATE '2024-01-01' + INTERVAL (i % 30) DAY AS DATE) AS d
        FROM range(1000) t(i)
        """
    )
    con.close()
    return path


@pytest.fixture(scope="module")
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DuckDBDataSource)
    yield spark
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_schema_and_full_read(registered, duck_db):
    df = (
        registered.read.format("duckdb")
        .option("database", duck_db)
        .option("table", "items")
        .load()
    )
    assert dict(df.dtypes) == {
        "id": "bigint",
        "name": "string",
        "score": "bigint",
        "d": "date",
    }
    assert df.count() == 1000
    assert df.filter(F.col("name").isNull()).count() == 100


def test_partitioned_read_covers_all_rows_once(registered, duck_db):
    df = (
        registered.read.format("duckdb")
        .option("database", duck_db)
        .option("table", "items")
        .option("partition_column", "id")
        .option("num_partitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    # no row lost or duplicated across the stride predicates
    assert df.count() == 1000
    assert df.select("id").distinct().count() == 1000


def test_filter_pushdown_matches_postfilter(registered, duck_db):
    df = (
        registered.read.format("duckdb")
        .option("database", duck_db)
        .option("query", "SELECT id, score FROM items")
        .option("partition_column", "id")
        .option("num_partitions", "4")
        .load()
    )
    got = sorted(
        r.id
        for r in df.filter(
            (F.col("score") >= 50) & (F.col("id") < 100) & F.col("score").isin(56, 63)
        ).collect()
    )
    con = duckdb.connect(duck_db)
    want = sorted(
        r[0]
        for r in con.sql(
            "SELECT id FROM items WHERE score >= 50 AND id < 100 AND score IN (56, 63)"
        ).fetchall()
    )
    con.close()
    assert got == want and got


def test_string_filter_quoting(registered, duck_db):
    df = (
        registered.read.format("duckdb")
        .option("database", duck_db)
        .option("table", "items")
        .load()
    )
    assert df.filter(F.col("name") == "name_7").count() == 1


def test_no_pushdown_mode(spark, duck_db):
    """option('pushdown','false') selects the reader WITHOUT pushFilters —
    the escape hatch for sessions running Spark's default conf, which
    refuses any reader that implements pushFilters. Filters then apply
    post-scan; results must be identical."""
    spark.dataSource.register(DuckDBDataSource)
    df = (
        spark.read.format("duckdb")
        .option("database", duck_db)
        .option("table", "items")
        .option("pushdown", "false")
        .option("partition_column", "id")
        .option("num_partitions", "3")
        .load()
    )
    # score = (7i) % 100 and 7 is invertible mod 100, so every residue
    # appears exactly once per 100 ids -> 9 residues > 90, 10 cycles = 90
    assert df.filter(F.col("score") > 90).count() == 90


def test_unmapped_types_read_as_string(registered, tmp_path):
    """ADVICE r3 low: types schema() maps to 'string' (UUID, TIME, LIST)
    must actually ARRIVE as strings — the reader CASTs them to VARCHAR in
    the remote SELECT instead of streaming the native Arrow type."""
    db = str(tmp_path / "odd.duckdb")
    con = duckdb.connect(db)
    con.sql(
        """
        CREATE TABLE odd AS
        SELECT i AS id,
               uuid() AS u,
               TIME '11:30:00' + INTERVAL (i) SECOND AS t,
               [i, i + 1] AS xs
        FROM range(5) s(i)
        """
    )
    con.close()
    df = (
        registered.read.format("duckdb")
        .option("database", db)
        .option("table", "odd")
        .load()
    )
    assert dict(df.dtypes) == {
        "id": "bigint",
        "u": "string",
        "t": "string",
        "xs": "string",
    }
    rows = df.orderBy("id").collect()
    assert len(rows) == 5
    assert rows[0].t == "11:30:00" and rows[0].xs == "[0, 1]"
    assert len(rows[0].u) == 36  # uuid text form


def test_writer_all_null_column_partition(registered, tmp_path):
    """ADVICE r3 medium: a partition whose column is entirely NULL must
    stage with the writer's DECLARED schema (not an inferred arrow null
    type), so the commit-side read_parquet union across staged files
    succeeds."""
    db = str(tmp_path / "nulls.duckdb")
    con = duckdb.connect(db)
    con.sql("CREATE TABLE sink2 (id BIGINT, v VARCHAR)")
    con.close()
    # range-partition by id: the low partition holds ONLY NULL v values
    df = registered.range(40).selectExpr(
        "id", "CASE WHEN id < 20 THEN NULL ELSE CAST(id AS STRING) END AS v"
    )
    (
        df.repartitionByRange(2, "id")
        .write.format("duckdb")
        .option("database", db)
        .option("table", "sink2")
        .mode("append")
        .save()
    )
    con = duckdb.connect(db, read_only=True)
    assert con.sql("SELECT COUNT(*) FROM sink2").fetchone()[0] == 40
    assert con.sql("SELECT COUNT(*) FROM sink2 WHERE v IS NULL").fetchone()[0] == 20
    con.close()


def test_writer_two_phase_commit_append_and_overwrite(registered, tmp_path):
    """Warehouse-load path (S8/S9): tasks stage parquet, the driver loads
    every staged file in ONE DuckDB transaction; overwrite deletes
    existing rows in the same transaction (transactional TRUNCATE)."""
    db = str(tmp_path / "wh.duckdb")
    con = duckdb.connect(db)
    con.sql("CREATE TABLE sink (id BIGINT, v VARCHAR)")
    con.sql("INSERT INTO sink VALUES (999, 'pre')")
    con.close()

    df = registered.range(100).selectExpr("id", "CAST(id AS STRING) AS v")
    (
        df.repartition(4)
        .write.format("duckdb")
        .option("database", db)
        .option("table", "sink")
        .mode("append")
        .save()
    )
    con = duckdb.connect(db, read_only=True)
    assert con.sql("SELECT COUNT(*) FROM sink").fetchone()[0] == 101
    con.close()

    (
        df.filter("id < 10")
        .write.format("duckdb")
        .option("database", db)
        .option("table", "sink")
        .mode("overwrite")
        .save()
    )
    con = duckdb.connect(db, read_only=True)
    assert con.sql("SELECT COUNT(*) FROM sink").fetchone()[0] == 10
    assert con.sql("SELECT COUNT(*) FROM sink WHERE v = 'pre'").fetchone()[0] == 0
    con.close()
