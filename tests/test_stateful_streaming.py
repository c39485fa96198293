"""applyInPandasWithState custom operator: streaming anomalies match
the driver-side Welford reference."""

from __future__ import annotations

import uuid

SF = "/root/testdata/sf0.001"


def test_anomaly_stream_matches_reference(spark):
    from pangenomesasgraphdatabases_spark.data import table
    from pangenomesasgraphdatabases_spark.streaming.events import events_stream
    from pangenomesasgraphdatabases_spark.streaming.stateful import (
        anomaly_batch_reference,
        anomaly_stream,
    )

    out = anomaly_stream(events_stream(spark, SF), z_thresh=2.0)
    name = "anom_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.user_id, r.event_id) for r in spark.table(name).collect()}

    pdf = (
        table(spark, SF, "events")
        .select("user_id", "event_id", "value", "ts_ns")
        .toPandas()
    )
    want = anomaly_batch_reference(pdf, z_thresh=2.0)
    assert got == want
    assert len(got) > 0
