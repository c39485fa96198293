"""Structured Streaming parity: AvailableNow streaming result equals
the batch aggregation (labeled engine extension, SURVEY.md 2.9)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_df(spark):
    from pangenomesasgraphdatabases_spark.streaming.events import events_stream

    return events_stream(spark, SF)


def test_tumbling_stream_matches_batch(spark, stream_df):
    from pangenomesasgraphdatabases_spark.queries.events_q import (
        events_tumbling_counts,
    )
    from pangenomesasgraphdatabases_spark.streaming.events import (
        run_available_now,
        tumbling_counts_stream,
    )

    got = run_available_now(tumbling_counts_stream(stream_df), spark)
    want = events_tumbling_counts(spark, SF)
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w


def test_session_window_stream_runs(spark, stream_df):
    from pangenomesasgraphdatabases_spark.streaming.events import (
        run_available_now,
        session_window_stream,
    )

    out = run_available_now(session_window_stream(stream_df), spark)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.session_end >= r.session_start for r in rows)
    assert all(r.n_events >= 1 for r in rows)


def test_dedup_stream_drops_planted_redeliveries(spark, tmp_path):
    """Planted duplicate rows must collapse to one survivor per
    fingerprint; distinct fingerprints all survive."""
    import datetime

    from pyspark.sql import functions as F

    from pangenomesasgraphdatabases_spark.streaming.events import (
        dedup_stream,
        run_available_now,
    )

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(20):
        ts = t0 + datetime.timedelta(minutes=i % 5)
        # i % 10 => each payload delivered exactly twice
        rows.append((i, ts, f"u{i % 10}", "click", float(i % 10)))
    src = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    path = str(tmp_path / "events_dup")
    src.coalesce(1).write.parquet(path)

    stream = (
        spark.readStream.schema(src.schema).format("parquet").load(path)
    )
    got = run_available_now(
        dedup_stream(stream, watermark="1 hour"), spark, output_mode="append"
    )
    fps = [r.fingerprint for r in got.collect()]
    assert len(fps) == 10 and len(set(fps)) == 10


def test_foreach_batch_sink_idempotent(spark, tmp_path):
    """AvailableNow drains the source into batch_id dirs; a rerun with
    the same checkpoint emits nothing new (offsets committed)."""
    from pangenomesasgraphdatabases_spark.streaming.events import (
        foreach_batch_parquet_sink,
    )

    src_path = str(tmp_path / "src")
    spark.range(100).withColumnRenamed("id", "v").write.parquet(src_path)
    src_schema = spark.read.parquet(src_path).schema

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(src_schema).format("parquet").load(src_path)
        q = foreach_batch_parquet_sink(stream, out, ckpt)
        q.awaitTermination(120)

    run()
    got = spark.read.parquet(out)
    assert got.count() == 100 and "batch_id" in got.columns

    run()  # same checkpoint: nothing to re-deliver
    assert spark.read.parquet(out).count() == 100


def test_sliding_stream_matches_batch(spark, stream_df):
    from pangenomesasgraphdatabases_spark.queries.events_q import events_sliding_avg
    from pangenomesasgraphdatabases_spark.streaming.events import (
        run_available_now,
        sliding_counts_stream,
    )

    got = run_available_now(sliding_counts_stream(stream_df), spark)
    want = events_sliding_avg(spark, SF)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
