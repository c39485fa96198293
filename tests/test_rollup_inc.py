"""Incremental rollup algebra: merge(rollup(A), rollup(B)) must equal
rollup(A ∪ B) for any batch split — the property that lets a 100 TB
deployment refresh aggregates without rescanning history."""

from __future__ import annotations

import datetime

from pangenomesasgraphdatabases_spark.operators.rollup_inc import (
    rollup_batch,
    rollup_merge,
    rollup_read,
)


def _events(spark, seed: int, n: int):
    t0 = datetime.datetime(2026, 3, 1)
    rows = [
        (
            t0 + datetime.timedelta(minutes=7 * i + seed),
            ["click", "view", "error"][(i + seed) % 3],
            float((i * 13 + seed) % 100) / 4.0,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["ts", "event_type", "value"])


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_full_rollup(spark):
    a = _events(spark, 0, 120)
    b = _events(spark, 5, 90)

    merged = rollup_merge(rollup_batch(a), rollup_batch(b))
    full = rollup_batch(a.unionByName(b))
    assert _canon(merged) == _canon(full)

    # Composition over a second increment, merged in the other order.
    c = _events(spark, 11, 40)
    twice = rollup_merge(rollup_batch(c), merged)
    assert _canon(twice) == _canon(rollup_batch(a.unionByName(b).unionByName(c)))


def test_read_view_derives_avg(spark):
    r = rollup_read(rollup_batch(_events(spark, 0, 60)))
    for row in r.collect():
        assert row.avg_value_micro == row.sum_value_micro // row.n_events
