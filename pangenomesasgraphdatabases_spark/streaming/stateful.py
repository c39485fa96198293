"""Custom stateful streaming operator via applyInPandasWithState
(engine extension; the brief's named API for custom state).

Running per-user anomaly detection over the events stream: state =
(count, mean, M2) Welford accumulator per user; each micro-batch
updates the state and emits events whose value deviates more than
`z_thresh` sigmas from the user's running mean at arrival time.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("running_mean", DoubleType()),
        StructField("running_std", DoubleType()),
        StructField("z", DoubleType()),
    ]
)


def _detect(z_thresh: float):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_ns", "event_id"])
            for r in pdf.itertuples(index=False):
                if n >= 5:
                    var = m2 / (n - 1)
                    std = var**0.5
                    if std > 0:
                        z = (r.value - mean) / std
                        if abs(z) >= z_thresh:
                            out.append(
                                (user_id, r.event_id, r.value, mean, std, z)
                            )
                # Welford update AFTER scoring (deviation vs history).
                n += 1
                delta = r.value - mean
                mean += delta / n
                m2 += delta * (r.value - mean)
        state.update((n, mean, m2))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return fn


def anomaly_stream(events: DataFrame, z_thresh: float = 2.5) -> DataFrame:
    """events: streaming DataFrame from streaming.events.events_stream.
    Returns the streaming anomaly frame (append mode)."""
    return (
        events.select("user_id", "event_id", "value", "ts_ns")
        .groupBy("user_id")
        .applyInPandasWithState(
            _detect(z_thresh),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def anomaly_batch_reference(events_pdf: pd.DataFrame, z_thresh: float = 2.5) -> set:
    """Driver-side reference implementation (same Welford recurrence)
    for parity testing at small scale."""
    out = set()
    states: dict = {}
    for r in events_pdf.sort_values(["user_id", "ts_ns", "event_id"]).itertuples(
        index=False
    ):
        n, mean, m2 = states.get(r.user_id, (0, 0.0, 0.0))
        if n >= 5:
            var = m2 / (n - 1)
            std = var**0.5
            if std > 0 and abs((r.value - mean) / std) >= z_thresh:
                out.add((r.user_id, r.event_id))
        n += 1
        delta = r.value - mean
        mean += delta / n
        m2 += delta * (r.value - mean)
        states[r.user_id] = (n, mean, m2)
    return out
