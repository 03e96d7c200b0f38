"""applyInPandasWithState operators, HTTP ETag source, stateful counter."""

from __future__ import annotations

import os

import pandas as pd
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from nifi_spark.ledger import KVState
from nifi_spark.operators import global_sequence, stateful_counter
from nifi_spark.sources import HttpIncrementalSource
from nifi_spark.streaming import (dedup_stream, rate_limit_stream,
                                  sessionize_stream)

EV_SCHEMA = "user_id long, event_id long, ts timestamp"


def _write_batches(spark, path, batches):
    """One parquet file per batch so maxFilesPerTrigger=1 yields one
    micro-batch per file (deterministic batch boundaries)."""
    for i, rows in enumerate(batches):
        (spark.createDataFrame(rows, EV_SCHEMA).coalesce(1)
         .write.parquet(os.path.join(path, f"b{i}"), mode="overwrite"))


def _run_stream(spark, src_dir, ckpt, build, name):
    reader = (spark.readStream.schema(EV_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(src_dir + "/*"))
    q = (build(reader).writeStream.format("memory").queryName(name)
         .outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_sessionize_stream_spans_batches(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    gap = timedelta(seconds=3600)
    # user 1: batch0 has 2 events 10s apart; batch1 continues 20s later
    # (SAME session across the batch boundary) then one far event (new
    # session). user 2 appears only in batch1.
    b0 = [(1, 1, t0), (1, 2, t0 + timedelta(seconds=10))]
    b1 = [(1, 3, t0 + timedelta(seconds=30)),
          (1, 4, t0 + gap * 2), (2, 5, t0)]
    src = str(tmp_path / "src")
    _write_batches(spark, src, [b0, b1])
    out = _run_stream(spark, src, str(tmp_path / "ck"),
                      lambda r: sessionize_stream(r, "user_id", "ts",
                                                  gap_sec=1800),
                      "sess_t")
    # memory sink in update mode: take the LAST row per user
    pdf = out.toPandas()
    last = pdf.groupby("user_id").last()
    assert int(last.loc[1, "n_sessions"]) == 2
    assert int(last.loc[1, "n_events"]) == 4
    assert int(last.loc[2, "n_sessions"]) == 1
    assert int(last.loc[2, "n_events"]) == 1


def test_rate_limit_stream_caps_and_accounts(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    b0 = [(1, i, t0) for i in range(5)] + [(2, 100, t0)]
    b1 = [(1, i, t0) for i in range(10, 14)]
    src = str(tmp_path / "src")
    _write_batches(spark, src, [b0, b1])
    out = _run_stream(
        spark, src, str(tmp_path / "ck"),
        lambda r: rate_limit_stream(r.withColumn(
            "event_id", F.col("event_id").cast("string")),
            "user_id", "event_id", max_per_trigger=3),
        "rate_t")
    pdf = out.toPandas()
    u1 = pdf[pdf["user_id"] == "1"]
    # 3 passed in batch0 (2 suppressed), 3 passed in batch1 (1 suppressed)
    assert len(u1) == 6
    assert int(u1["passed_total"].max()) == 6
    assert int(u1["suppressed_total"].max()) == 3
    u2 = pdf[pdf["user_id"] == "2"]
    assert len(u2) == 1 and int(u2["suppressed_total"].max()) == 0


def test_dedup_stream_within_and_beyond_horizon(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    h = timedelta(hours=1)
    # b0: A twice (in-batch dup), B once. b1: A again 30s later
    # (cross-batch dup, inside the horizon) + an advancer event D at
    # t0+3h that pushes the watermark to t0+2h, expiring A's state.
    # b2: A at t0+3h — beyond the horizon from the original, so it
    # SURVIVES (the documented trade of watermarked dedup).
    b0 = [(1, 1, t0), (1, 2, t0 + timedelta(seconds=10)), (2, 3, t0)]
    b1 = [(1, 4, t0 + timedelta(seconds=30)), (4, 5, t0 + 3 * h)]
    # eviction runs at batch END with the PREVIOUS batch's watermark, so
    # a buffer batch must elapse before the re-occurrence arrives
    b2 = [(5, 9, t0 + 3 * h)]
    b3 = [(1, 6, t0 + 3 * h)]
    src = str(tmp_path / "src")
    _write_batches(spark, src, [b0, b1, b2, b3])
    reader = (spark.readStream.schema(EV_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    q = (dedup_stream(reader, ["user_id"], "ts", watermark="1 hour")
         .writeStream.format("memory").queryName("dedup_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    pdf = spark.sql("select * from dedup_t").toPandas()
    per_user = pdf.groupby("user_id").size()
    assert int(per_user.loc[1]) == 2          # t0 survivor + post-expiry
    assert int(per_user.loc[2]) == 1
    assert int(per_user.loc[4]) == 1
    assert sorted(pdf["event_id"]) == [1, 3, 5, 6, 9]


def test_http_incremental_source(tmp_path):
    calls = []

    def fake(url, etag, last_modified):
        calls.append((url, etag, last_modified))
        if etag == "v2":
            return 304, None, "v2", "mon"
        return 200, b"payload-2", "v2", "mon"

    st = KVState(str(tmp_path / "state"))
    src = HttpIncrementalSource("http://example.test/feed", st, key="feed",
                                fetcher=fake)
    assert src.poll() == b"payload-2"          # first: no etag sent
    assert calls[0][1] is None
    assert src.poll() is None                  # second: 304 via etag
    assert calls[1][1] == "v2"
    # state survives a new instance (persisted JSON)
    src2 = HttpIncrementalSource("http://example.test/feed",
                                 KVState(str(tmp_path / "state")),
                                 key="feed", fetcher=fake)
    assert src2.poll() is None
    assert st.get("feed")["etag"] == "v2"


def test_global_sequence_matches_sort(spark):
    df = spark.createDataFrame([(i * 7 % 100, f"v{i}") for i in range(100)],
                               "k long, v string")
    out, nxt = global_sequence(df, "k", start=10)
    assert nxt == 110
    pdf = out.toPandas().sort_values("seq")
    assert pdf["seq"].tolist() == list(range(10, 110))
    # seq order must equal k order (range partition + in-partition sort)
    assert pdf["k"].is_monotonic_increasing


def test_stateful_counter_continues_across_batches(spark, tmp_path):
    st = KVState(str(tmp_path / "st"))
    b0 = spark.createDataFrame([(i,) for i in range(5)], "k long")
    b1 = spark.createDataFrame([(i,) for i in range(5, 8)], "k long")
    s0 = stateful_counter(b0, st, "ctr", "k").toPandas()
    s1 = stateful_counter(b1, st, "ctr", "k").toPandas()
    assert sorted(s0["seq"]) == [0, 1, 2, 3, 4]
    assert sorted(s1["seq"]) == [5, 6, 7]
    assert st.get("ctr")["next"] == 8


def test_interval_join_streams_across_batches(spark, tmp_path):
    from nifi_spark.streaming import interval_join_streams
    t0 = datetime(2024, 1, 1)
    m = timedelta(minutes=1)
    # left views in batch0; right purchases split across batch0/batch1 —
    # the cross-batch match must come from buffered join state
    b0 = [(1, 10, t0), (2, 20, t0 + 5 * m)]
    b1 = [(1, 11, t0 + 10 * m), (2, 21, t0 + 90 * m)]  # 21 outside window
    src = str(tmp_path / "src")
    _write_batches(spark, src, [b0, b1])

    def reader():
        return (spark.readStream.schema(EV_SCHEMA)
                .option("maxFilesPerTrigger", "1").parquet(src + "/*"))

    left = (reader().filter(F.col("event_id").isin(10, 20))
            .select("user_id", "ts", F.col("event_id").alias("l_id")))
    right = (reader().filter(F.col("event_id").isin(11, 21))
             .select("user_id", "ts", F.col("event_id").alias("r_id")))
    q = (interval_join_streams(left, right, ["user_id"],
                               watermark="30 minutes", within="30 minutes")
         .writeStream.format("memory").queryName("ij_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.user_id, r.l_id, r.r_id)
            for r in spark.sql("select * from ij_t").collect()}
    # user 1: view@t0 ↔ purchase@t0+10m (cross-batch, inside 30m) joins;
    # user 2: purchase 85 minutes after the view — outside the window
    assert rows == {(1, 10, 11)}


def test_detect_duplicate_stream_across_batches(spark, tmp_path):
    """First sighting routes non-duplicate; re-sightings in LATER
    micro-batches still route duplicate (the state crosses batches),
    with dup_count continuing where the previous batch left off."""
    from nifi_spark.streaming import detect_duplicate_stream

    t0 = datetime(2024, 1, 1)
    src = str(tmp_path / "src")
    _write_batches(spark, src, [
        # batch 0: key 1 twice (ids 10, 11), key 2 once
        [(1, 10, t0), (1, 11, t0), (2, 20, t0)],
        # batch 1: key 1 again twice, key 3 new
        [(1, 12, t0), (1, 13, t0), (3, 30, t0)],
    ])
    reader = (spark.readStream.schema(EV_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    q = (detect_duplicate_stream(reader, ["user_id"], id_col="event_id")
         .writeStream.format("memory").queryName("detdup_x")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql("select * from detdup_x").toPandas()
           .set_index("event_id").sort_index())
    assert got.loc[10, "is_duplicate"] == False  # noqa: E712
    assert got.loc[11, "is_duplicate"] == True   # noqa: E712 — in-batch dup
    assert got.loc[12, "is_duplicate"] == True   # cross-batch dup
    assert list(got.loc[[10, 11, 12, 13], "dup_count"]) == [0, 1, 2, 3]
    assert got.loc[20, "is_duplicate"] == False  # noqa: E712
    assert got.loc[30, "is_duplicate"] == False  # noqa: E712 — new key, batch 1


def test_detect_duplicate_stream_age_off_runs(spark, tmp_path):
    """The Age Off Duration knob (ProcessingTime GroupState timeout)
    wires up and the query completes; deterministic expiry can't be
    asserted under availableNow (wall-clock), so this pins the plumbing
    while the no-TTL semantics are gate-verified."""
    from nifi_spark.streaming import detect_duplicate_stream

    t0 = datetime(2024, 1, 1)
    src = str(tmp_path / "src")
    _write_batches(spark, src, [[(1, 10, t0), (1, 11, t0)]])
    reader = (spark.readStream.schema(EV_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    q = (detect_duplicate_stream(reader, ["user_id"], id_col="event_id",
                                 age_off_ms=60_000)
         .writeStream.format("memory").queryName("detdup_ttl")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from detdup_ttl").toPandas()
    assert sorted(got.is_duplicate) == [False, True]
