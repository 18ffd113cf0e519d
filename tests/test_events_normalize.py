"""Regression: ``_normalize_events`` must handle every ``ts`` encoding the
testdata has ever shipped. Round 4 broke on plain ``timestamp[us]``
(Spark infers TIMESTAMP_NTZ; the old code only had LongType/LTZ branches
and ``unix_micros`` threw on NTZ), taking down 49 pytest items, both
funnel CORRECTNESS queries, and the entire bench. These tests pin all
three encodings to the same integer-microsecond result, timezone-
independently."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_indexedrdd_spark.sources.tables import load_table

ROWS = [
    (0, datetime.datetime(2024, 1, 1, 0, 9, 58, 778549)),
    (1, datetime.datetime(2024, 3, 15, 12, 0, 0, 5)),
    (2, datetime.datetime(2025, 12, 31, 23, 59, 59, 999999)),
]
EXPECTED_US = [
    (dt - datetime.datetime(1970, 1, 1)) // datetime.timedelta(microseconds=1)
    for _, dt in ROWS
]


def _write_events(tmp_path, ts_type, name):
    ids = pa.array([r[0] for r in ROWS], pa.int64())
    ts = pa.array([r[1] for r in ROWS]).cast(ts_type)
    fill = pa.array([1, 2, 3], pa.int64())
    etype = pa.array(["a", "b", "c"])
    val = pa.array([1.0, 2.0, 3.0])
    props = pa.array(["{}", "{}", "{}"])
    tbl = pa.table(
        {
            "event_id": ids,
            "ts": ts,
            "user_id": fill,
            "event_type": etype,
            "value": val,
            "props": props,
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "ts_type,label",
    [
        (pa.timestamp("us"), "us_ntz"),  # current testdata encoding
        (pa.timestamp("us", tz="UTC"), "us_utc"),
        (pa.timestamp("ns"), "ns_legacy"),
    ],
)
def test_normalize_events_all_encodings(spark, tmp_path, ts_type, label):
    sf_dir = _write_events(tmp_path, ts_type, label)
    df = load_table(spark, sf_dir, "events")
    got = {r.event_id: r.ts_us for r in df.select("event_id", "ts_us").collect()}
    assert got == {i: us for i, us in enumerate(EXPECTED_US)}
    # every branch rebuilds ts as a plain TIMESTAMP instant
    assert df.schema["ts"].dataType.typeName() == "timestamp"


def test_normalize_events_ntz_is_timezone_independent(spark, tmp_path):
    """The NTZ branch must compute wall-clock micros regardless of
    spark.sql.session.timeZone — the driver's session may not be UTC."""
    sf_dir = _write_events(tmp_path, pa.timestamp("us"), "ntz_tzcheck")
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, sf_dir, "events")
        got = {r.event_id: r.ts_us for r in df.select("event_id", "ts_us").collect()}
        assert got == {i: us for i, us in enumerate(EXPECTED_US)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_normalize_events_rejects_unknown_type(spark, tmp_path):
    ids = pa.array([0], pa.int64())
    tbl = pa.table({"event_id": ids, "ts": pa.array(["not-a-ts"])})
    d = tmp_path / "bad"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    with pytest.raises(TypeError, match="unsupported type"):
        load_table(spark, str(d), "events")
