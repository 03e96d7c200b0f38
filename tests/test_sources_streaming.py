"""Sources (changelog tail, listing watermark, partition planner) and the
Structured Streaming CDC front-end."""

from __future__ import annotations

import os
import time

import pytest

from nifi_spark import fixtures, oracle
from nifi_spark.ledger import OffsetLedger
from nifi_spark.sources import (ChangelogSource, list_new_files,
                                plan_fetch_partitions)
from nifi_spark.storage import SnapshotTableStore
from nifi_spark.streaming import StreamingCdcPipeline, windowed_rollup


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    log = fixtures.gen_changelog(n_events=2000, n_repos=10, paths_per_repo=5)
    path = str(tmp_path_factory.mktemp("src") / "log.parquet")
    fixtures.write_changelog_parquet(log, path)
    return log, path


def test_changelog_source_watermark_delta(spark, changelog):
    """QueryDatabaseTableTest.testAddedRows analog: full slice, then empty,
    then exactly the delta."""
    log, path = changelog
    src = ChangelogSource(spark, path)
    hi = src.max_lsn()
    assert hi == int(log["lsn"].max())
    all_rows = src.read_slice(-1).count()
    assert all_rows == len(log)
    assert src.read_slice(hi).count() == 0          # nothing past the wm
    mid = hi // 2
    delta = src.read_slice(mid).count()
    assert delta == int((log["lsn"] > mid).sum())   # strict > semantics


def test_changelog_source_plan_bounds(spark, changelog):
    _, path = changelog
    src = ChangelogSource(spark, path)
    bounds = src.plan_bounds(-1, 500)
    assert bounds[-1] == src.max_lsn()
    assert all(b2 > b1 for b1, b2 in zip(bounds, bounds[1:]))
    # resumable: planning from a mid watermark yields only later bounds
    bounds2 = src.plan_bounds(bounds[0], 500)
    assert bounds2[0] > bounds[0]


def test_list_new_files_watermark_and_lag(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("x")
    (d / "b.txt").write_text("y")
    time.sleep(0.15)  # age past the lag guard
    entries, wm = list_new_files(str(d), after_mtime=0, lag_seconds=0.1)
    assert [os.path.basename(e["path"]) for e in entries] == ["a.txt", "b.txt"]
    # nothing new past the committed watermark
    entries2, _ = list_new_files(str(d), after_mtime=wm, lag_seconds=0.1)
    assert entries2 == []
    # a file inside the lag window is withheld (same-millisecond guard)
    (d / "c.txt").write_text("z")
    entries3, _ = list_new_files(str(d), after_mtime=wm, lag_seconds=30)
    assert entries3 == []


def test_plan_fetch_partitions(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    bounds = plan_fetch_partitions(df, "k", rows_per_partition=2500)
    assert 3 <= len(bounds) <= 5
    assert bounds[0][0] is None and bounds[-1][1] is None
    # ranges must tile: each upper bound is the next lower bound
    for (_, hi), (lo, _) in zip(bounds, bounds[1:]):
        assert hi == lo


def test_streaming_cdc_matches_oracle(spark, tmp_path, changelog):
    log, path = changelog
    # file-stream sources read a DIRECTORY of files (the tailed log dir)
    log_dir = tmp_path / "logdir"
    log_dir.mkdir()
    import shutil
    shutil.copy(path, log_dir / "part-000.parquet")
    store = SnapshotTableStore(str(tmp_path / "tbl"), n_buckets=4)
    store.init()
    pipe = StreamingCdcPipeline(
        spark, str(log_dir), store, OffsetLedger(str(tmp_path / "ck")),
        checkpoint_dir=str(tmp_path / "sck"), max_files_per_trigger=1)
    q = pipe.start(trigger_once=True)
    q.awaitTermination(120)
    got = store.read(spark).toPandas()
    exp, _ = oracle.replay(log)
    assert len(got) == len(exp)
    gm = got.set_index(["repo", "path"])["content"].to_dict()
    em = exp.set_index(["repo", "path"])["content"].to_dict()
    assert gm == em


def test_windowed_rollup_batch_semantics(spark):
    """Watermarked rollup runs in batch mode too (withWatermark is a
    no-op there) — validates the aggregation shape."""
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 1.0), (2, "2024-01-01 00:50:00", 2.0),
         (3, "2024-01-01 01:10:00", 4.0)],
        "event_id long, ts string, value double").withColumn(
        "ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    out = windowed_rollup(ev).orderBy("window_start").collect()
    assert [r["n"] for r in out] == [2, 1]
    assert out[0]["sum_value"] == 3.0


def test_get_files_and_fetch(spark, tmp_path):
    from nifi_spark.sources import fetch_files, get_files
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("alpha content")
    (d / "b.txt").write_text("beta")
    (d / "c.log").write_text("ignored")
    df = get_files(spark, str(d), glob="*.txt", text_charset="utf-8")
    got = {r.path.split("/")[-1]: (r.length, r.text) for r in df.collect()}
    assert got == {"a.txt": (13, "alpha content"), "b.txt": (4, "beta")}
    listing = spark.createDataFrame(
        [(str(d / "a.txt"), 1)], "path string, priority int")
    fetched = fetch_files(listing, spark, str(d), text_charset="utf-8")
    rows = fetched.collect()
    assert len(rows) == 1 and rows[0].text == "alpha content"
    assert rows[0].priority == 1


def test_list_database_tables_refresh_interval(spark, tmp_path):
    """ListDatabaseTables analog: emit once per refresh window; a table
    created mid-window is the only new emission; after the window
    everything re-lists (the reference's Refresh Interval semantics)."""
    from nifi_spark.ledger import KVState
    from nifi_spark.sources import list_database_tables
    spark.createDataFrame([(1,)], "x long").createOrReplaceTempView("ldt_a")
    spark.createDataFrame([(2,)], "x long").createOrReplaceTempView("ldt_b")
    state = KVState(str(tmp_path / "st"))
    first, st = list_database_tables(spark, state, pattern="ldt_*",
                                     refresh_seconds=100, now=1000.0)
    assert [e["table"] for e in first] == ["ldt_a", "ldt_b"]
    state.put("db_tables", st)

    # inside the window: nothing re-lists; a NEW table is emitted alone
    spark.createDataFrame([(3,)], "x long").createOrReplaceTempView("ldt_c")
    second, st2 = list_database_tables(spark, state, pattern="ldt_*",
                                       refresh_seconds=100, now=1050.0)
    assert [e["table"] for e in second] == ["ldt_c"]
    state.put("db_tables", st2)

    # window expired: all three re-list
    third, _ = list_database_tables(spark, state, pattern="ldt_*",
                                    refresh_seconds=100, now=1200.0)
    assert [e["table"] for e in third] == ["ldt_a", "ldt_b", "ldt_c"]

    # crash before commit: state unchanged -> at-least-once re-list
    again, _ = list_database_tables(spark, state, pattern="ldt_*",
                                    refresh_seconds=100, now=1201.0)
    assert [e["table"] for e in again] == ["ldt_a", "ldt_b", "ldt_c"]


def test_read_slice_multi_and_max_values(spark, tmp_path):
    """Multi-column max-value watermark: first col strict >, later >=
    (QueryDatabaseTable.getQuery); max_values returns the new marks."""
    from nifi_spark.sources import ChangelogSource
    rows = [(i, i // 10, f"v{i}") for i in range(100)]
    path = str(tmp_path / "log")
    spark.createDataFrame(rows, "seq long, bucket long, v string") \
         .write.parquet(path)
    src = ChangelogSource(spark, path, lsn_col="seq")
    got = src.read_slice_multi([("bucket", 5), ("seq", 62)]) \
             .select("seq").toPandas()["seq"].tolist()
    # bucket > 5 (seq >= 60) AND seq >= 62
    assert sorted(got) == list(range(62, 100))
    assert src.max_values(["seq", "bucket"]) == {"seq": 99, "bucket": 9}
