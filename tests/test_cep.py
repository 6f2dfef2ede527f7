"""CEP pattern matching (streaming/cep): hand-computed fixture,
cross-batch state carry, within-window expiry, and stream == batch
replay equivalence."""

from __future__ import annotations

import datetime as dt

from deepee_spark.streaming.cep import batch_pattern_match, stream_pattern_match


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


_EVENTS = [
    # u1: view -> click -> buy with noise between (completes)
    (1, _ts(0), "view"), (1, _ts(5), "scroll"), (1, _ts(10), "click"),
    (1, _ts(15), "view"), (1, _ts(20), "buy"),
    # u1 second run: completes again (non-overlapping reset)
    (1, _ts(30), "view"), (1, _ts(35), "click"), (1, _ts(40), "buy"),
    # u2: stalls after click — no match
    (2, _ts(0), "view"), (2, _ts(5), "click"),
    # u3: within-window expiry then a fresh complete run
    (3, _ts(0), "view"), (3, _ts(100), "click"),  # click is 100s late
    (3, _ts(110), "view"), (3, _ts(115), "click"), (3, _ts(120), "buy"),
]
_PATTERN = ["view", "click", "buy"]


def _batch(spark, rows, within_s):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    return batch_pattern_match(df, _PATTERN, within_s=within_s).collect()


def test_batch_semantics(spark):
    got = {
        (r.key, r.start_ts.second + 60 * r.start_ts.minute,
         r.end_ts.second + 60 * r.end_ts.minute, r.n_events_seen)
        for r in _batch(spark, _EVENTS, within_s=60)
    }
    assert got == {
        ("1", 0, 20, 5),     # 5 events from first view to buy
        ("1", 30, 40, 3),
        ("3", 110, 120, 3),  # the stalled (0,100) prefix expired
    }


def test_no_within_allows_slow_match(spark):
    rows = [(3, _ts(0), "view"), (3, _ts(100), "click"),
            (3, _ts(200), "buy")]
    got = _batch(spark, rows, within_s=None)
    assert len(got) == 1 and got[0].n_events_seen == 3


def test_stream_matches_batch_across_drops(spark, tmp_path):
    """State carries across micro-batches: split the fixture into two
    parquet drops mid-pattern; streamed matches == batch on the
    concatenation."""
    src = str(tmp_path / "events")
    df = spark.createDataFrame(
        _EVENTS, "user_id long, ts timestamp, event_type string"
    )
    # drop 1 = everything before t=15; drop 2 = the rest (u1's first
    # pattern spans the boundary)
    df.filter(f"ts < timestamp'{_ts(15)}'").coalesce(1).write.parquet(
        src + "/d1"
    )
    df.filter(f"ts >= timestamp'{_ts(15)}'").coalesce(1).write.parquet(
        src + "/d2"
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    sink = str(tmp_path / "matches")
    q = (
        stream_pattern_match(stream, _PATTERN, within_s=60)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.key, r.start_ts, r.end_ts, r.n_events_seen)
        for r in spark.read.parquet(sink).collect()
    }
    batch = {
        (r.key, r.start_ts, r.end_ts, r.n_events_seen)
        for r in _batch(spark, _EVENTS, within_s=60)
    }
    assert streamed == batch and len(streamed) == 3
