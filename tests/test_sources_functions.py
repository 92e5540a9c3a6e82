"""Sources/sinks + scalar-function library tests (SURVEY §2.1, §2.7)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hive_backend_spark import functions as FX
from hive_backend_spark import sources as SRC
from hive_backend_spark.catalog import load_table
from hive_backend_spark.plans import pushed_filters

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_json_ingest_roundtrip(spark):
    """S4: JSON body -> typed rows -> selection payload struct."""
    lines = [
        '{"spreadsheetId":"s1","sheetName":"Sheet1","range":"A1","numRows":1,'
        '"numColumns":1,"timestamp":"t","active":true,"syncEnabled":true}',
        '{"spreadsheetId":"s2","sheetName":"Data","range":"B2:C3","numRows":2,'
        '"numColumns":2,"timestamp":"t2","active":false,"syncEnabled":true}',
        "not json at all",
    ]
    df = SRC.events_from_json(spark, lines, SRC.SELECTION_SCHEMA)
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0].sheetName == "Sheet1" and rows[1].numRows == 2
    assert rows[2].spreadsheetId is None  # malformed -> nulls, not failure


def test_parse_json_props_on_events(spark):
    events = load_table(spark, SF_DIR, "events")
    parsed = SRC.parse_json_props(events, "props", "k INT")
    ok = parsed.filter(F.col("props_parsed").isNotNull())
    assert ok.count() > 0


def test_partitioned_write_prunes(spark, tmp_path):
    """S3/S5: partitioning by the reference's 'indexed' columns turns
    equality predicates into partition pruning (no filter reaches parquet
    because the directory layout already applied it)."""
    d = str(tmp_path / "events_by_type")
    events = load_table(spark, SF_DIR, "events")
    SRC.write_partitioned(events, d, ["event_type"])
    back = SRC.read_partitioned(spark, d)
    assert back.count() == events.count()
    one = back.filter(F.col("event_type") == "click")
    assert one.count() == events.filter(F.col("event_type") == "click").count()
    # partition pruning: no event_type filter is pushed to the parquet scan
    assert not any("event_type" in f for f in pushed_filters(one))


def test_compound_key_roundtrip(spark):
    df = spark.createDataFrame([("Sheet1!A1",), ("My Data!B2:C3",)], "cell_id STRING")
    sheet, rng = FX.split_compound_key(F.col("cell_id"))
    out = df.select(
        sheet.alias("s"), rng.alias("r"), FX.build_compound_key(sheet, rng).alias("back")
    ).collect()
    assert out[0].s == "Sheet1" and out[0].r == "A1"
    assert out[1].s == "My Data" and out[1].r == "B2:C3"
    assert all(r.back == orig for r, orig in zip(out, ["Sheet1!A1", "My Data!B2:C3"]))


def test_marker_ops(spark):
    df = spark.createDataFrame([("hello",), (FX.MARKER + " linked",)], "text STRING")
    out = df.select(
        FX.has_marker(F.col("text")).alias("has"),
        FX.strip_marker(F.col("text")).alias("stripped"),
        FX.with_marker(F.col("text")).alias("marked"),
    ).collect()
    assert [r.has for r in out] == [False, True]
    assert out[1].stripped == "linked"
    assert out[0].marked == FX.MARKER + " hello"
    assert out[1].marked == FX.MARKER + " linked"  # idempotent


def test_deterministic_id(spark):
    events = load_table(spark, SF_DIR, "events").limit(100)
    ids = events.select(
        FX.deterministic_id("upd", F.col("event_id"), F.col("event_type")).alias("id")
    )
    again = events.select(
        FX.deterministic_id("upd", F.col("event_id"), F.col("event_type")).alias("id")
    )
    assert ids.distinct().count() == 100
    assert ids.exceptAll(again).count() == 0
    assert ids.first().id.startswith("upd-")


def test_retry_counter_and_priority(spark):
    df = spark.createDataFrame(
        [("error", 2, None), ("active", 5, 3)], "status STRING, retry_count INT, priority INT"
    )
    out = df.select(
        FX.retry_counter(F.col("status"), F.col("retry_count")).alias("rc"),
        FX.null_safe_priority(F.col("priority")).alias("p"),
    ).collect()
    assert [r.rc for r in out] == [3, 0]
    assert [r.p for r in out] == [0, 3]


def test_backoff_schedule():
    sched = FX.backoff_schedule()
    assert sched[0] == 1000 and sched[-1] == 30000
    assert all(b > a for a, b in zip(sched, sched[1:]))


def test_interval_ago_epoch(spark):
    df = spark.createDataFrame([("2024-01-31 00:00:00",)], "t STRING").select(
        F.col("t").cast("timestamp").alias("t")
    )
    out = df.select(
        FX.interval_ago(F.col("t"), 90, "MINUTES").alias("ago"),
        FX.epoch_seconds(F.col("t")).alias("ep"),
    ).collect()[0]
    assert str(out.ago) == "2024-01-30 22:30:00"
    assert out.ep == 1706659200

def test_interchange_format_roundtrips(spark, tmp_path):
    """Every interchange format round-trips the events table with schema
    and values intact (CSV/JSON via explicit schema — no inference pass)."""
    events = load_table(spark, SF_DIR, "events").orderBy("event_id").limit(200)
    schema = events.schema
    expected = [tuple(r) for r in events.collect()]
    for fmt in SRC.INTERCHANGE_FORMATS:
        d = str(tmp_path / f"events_{fmt}")
        SRC.write_table(events, d, fmt)
        back = SRC.read_table(
            spark, d, fmt, schema=schema if fmt in ("json", "csv") else None
        )
        assert back.schema == schema, fmt
        got = [tuple(r) for r in back.orderBy("event_id").collect()]
        assert got == expected, fmt


def test_read_without_schema_rejected(spark, tmp_path):
    import pytest as _pytest

    for fmt in ("json", "csv"):
        with _pytest.raises(ValueError, match="explicit schema"):
            SRC.read_table(spark, str(tmp_path), fmt)


def test_load_table_missing_dir_names_path(spark):
    """A bad sf_dir must fail fast with the offending path in the error, not
    a downstream NPE at action time."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    from hive_backend_spark.catalog import load_table

    with pytest.raises(AnalysisException, match="/no/such/dir"):
        load_table(spark, "/no/such/dir", "events").count()


def test_json_ingest_quarantine_splits_dead_letters(spark):
    """S4 + dead-letter queue: malformed payloads land in quarantine with
    their original bytes intact; well-formed rows parse fully; nothing is
    silently dropped or nulled."""
    lines = [
        '{"spreadsheetId":"s1","sheetName":"Sheet1","range":"A1","numRows":1,'
        '"numColumns":1,"timestamp":"t","active":true,"syncEnabled":true}',
        "not json at all",
        '{"spreadsheetId":"s2" "missing_comma":1}',
        '{"spreadsheetId":"s3","sheetName":"Ok","range":"B1","numRows":2,'
        '"numColumns":3,"timestamp":"t3","active":false,"syncEnabled":false}',
    ]
    good, bad = SRC.json_ingest_quarantine(spark, lines, SRC.SELECTION_SCHEMA)
    g = good.collect()
    b = [r.raw_payload for r in bad.collect()]
    assert {r.spreadsheetId for r in g} == {"s1", "s3"}
    assert "_corrupt" not in good.columns
    # quarantine preserves the exact original payloads for replay
    assert sorted(b) == sorted([lines[1], lines[2]])
    assert len(g) + len(b) == len(lines)
