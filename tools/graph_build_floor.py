"""Calm-floor probe for graph_build_770x6000 (VERDICT r13 #3).

5+ reps of the reference-scale graph build in exact bench shape
(inputs persisted + forced OUTSIDE the timer, noop sink, clearCache
between reps) with the bench's calibration probe at both ends — the
dedicated harness for adjudicating the baseline-anchor metric
against host weather.  Run it SOLO on an idle machine: concurrent
Spark work (an oracle gate, the bench itself) is self-inflicted
steal and invalidates the session.

r14 evidence (six sessions, COVERAGE.md r14 addendum): the floor was
13.3-13.5 s across hsi 1.06-2.46 — insensitive to the CPU-steal
index, the signature of the calibration probe's bandwidth/LLC blind
spot — while `git diff` showed zero commits on the executed build
path since the 12.00 r12 anchor, so the 12.6 s bisect trigger
resolved to environment, not code.

Usage: python tools/graph_build_floor.py [reps]   (default 5)
Prints one JSON line: times, per-rep steal, min, calibration probes,
host_speed_index.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo root on path; reuses the bench probes)
from pangenomesasgraphdatabases_spark.graph.build import build_graph  # noqa: E402
from pangenomesasgraphdatabases_spark.graph.fixtures import (  # noqa: E402
    synthetic_feature_tables,
)
from pangenomesasgraphdatabases_spark.session import get_spark  # noqa: E402

TABLES = (
    "features",
    "clusters",
    "ortholog",
    "feature_neighbour",
    "cluster_neighbour",
    "feature_in_strain",
    "cluster_in_strain",
    "strains",
)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark()
    # codegen / python-worker warmup at toy scale
    fw, cw, compw = synthetic_feature_tables(spark, 20, 50)
    build_graph(spark, fw, cw, compw, persist=True).features.count()
    spark.catalog.clearCache()

    cal_pre, _, _ = bench._calibration_probe(spark)
    f, c, comp = synthetic_feature_tables(spark, 770, 6000)
    times, steals = [], []
    for _ in range(reps):
        for src in (f, c, comp):
            src.persist().count()
        s0 = bench._read_steal()
        t0 = time.time()
        g = build_graph(spark, f, c, comp, persist=True)
        for tbl in TABLES:
            getattr(g, tbl).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
        steals.append(bench._read_steal() - s0)
        spark.catalog.clearCache()
    cal_post, _, _ = bench._calibration_probe(spark)
    print(
        json.dumps(
            {
                "times": times,
                "steals": steals,
                "min": min(times),
                "cal_pre": cal_pre,
                "cal_post": cal_post,
                "hsi": round(
                    min(cal_pre, cal_post) / bench.CALIBRATION_REF_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
