"""Hot-gram planted fixture for the window-over-key pattern (VERDICT
r11 #3).

The r11s2 rewrites (doc_duplicate_spans, doc_segment_dedup, the
docfreq/novelty/minimizer windows) compute per-key count/min with ONE
unordered window over the key instead of groupBy + join-back.  The
documented hazard: a gram duplicated g times lands its g rows in ONE
spillable WindowExec buffer — asserted equivalent to the join shape's
hot key "minus a shuffle", but never MEASURED on a planted
pathological fixture.  This tool plants the fixture and runs the A/B:

* fixture: every document gets the same 8-word phrase appended TWICE
  ("P P", 16 words).  The phrase-gram itself then occurs 2x per doc
  (a 100k-duplicate gram at the 10x point, 300k at 30x) and each of
  its 7 rotations across the P->P junction occurs 1x per doc (seven
  more 50k/150k-hot grams) — a realistic boilerplate pathology, much
  hotter than anything in the organic corpus.  Other columns are
  copied verbatim (n_chars goes stale; the queries under test read
  only doc_id/text).
* shapes, both producing the duplicate-position frame (doc_id, p) of
  doc_duplicate_spans' detection stage (verified identical on the
  planted sf0.1 fixture before timing):
  - WINDOW (shipped): count + min-struct over Window.partitionBy(gk);
  - SALTED 2-STAGE AGG (the alternative the VERDICT names): partial
    groupBy(gk, salt64) -> final groupBy(gk) -> join back to grams —
    no single-buffer key, at the cost of a second exchange and a
    double lineage execution.
* metrics: wall (reps with per-rep steal) and shuffle SPILL deltas
  read from the live UI REST API (memory/disk bytes spilled across
  completed stages), the direct evidence for "does the hot buffer
  spill".

Usage: python tools/hotgram_ab.py [plant|run|verify|all]  (default all)
Fixture dirs: .scale/hotgram01 (from sf0.1), hotgram1 (10x), hotgram3
(30x) — gitignored like the rest of .scale.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PHRASE = "zqx1 zqx2 zqx3 zqx4 zqx5 zqx6 zqx7 zqx8"
SPAN_L = 8
REPS = 3

FIXTURES = {
    "hotgram01": "/root/testdata/sf0.1",
    "hotgram1": os.path.join(REPO, ".scale", "sf1"),
    "hotgram3": os.path.join(REPO, ".scale", "sf3"),
}


def plant() -> None:
    for name, src in FIXTURES.items():
        if not os.path.exists(os.path.join(src, "documents.parquet")):
            print(
                f"skip {name}: {src} missing (run tools/gen_scale_data.py "
                "first for the 10x/30x tiers)",
                file=sys.stderr,
            )
            continue
        out = os.path.join(REPO, ".scale", name)
        os.makedirs(out, exist_ok=True)
        dst = os.path.join(out, "documents.parquet")
        duckdb.sql(
            f"COPY (SELECT doc_id, text || ' {PHRASE} {PHRASE}' AS text,"
            f" lang, source, n_chars FROM '{src}/documents.parquet')"
            f" TO '{dst}' (FORMAT PARQUET)"
        )
        print(f"planted {dst}", file=sys.stderr)


def _grams(spark, sf_dir):
    from pyspark.sql import functions as F

    from pangenomesasgraphdatabases_spark.data import table

    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split(F.trim("text"), " ").alias("ws"))
    return (
        words.filter(F.size("ws") >= SPAN_L)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.size("ws") - SPAN_L)).alias("p"),
            "ws",
        )
        .select(
            "doc_id",
            F.col("p").cast("long").alias("p"),
            F.substring(
                F.md5(F.array_join(F.slice("ws", F.col("p") + 1, SPAN_L), " ")),
                1,
                16,
            ).alias("gk"),
        )
    )


def window_dup(spark, sf_dir):
    """The shipped shape: one unordered window over gk."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    grams = _grams(spark, sf_dir)
    key = F.struct(F.col("doc_id").alias("d"), F.col("p").alias("i"))
    wk = Window.partitionBy("gk")
    return (
        grams.withColumn("c", F.count(F.lit(1)).over(wk))
        .withColumn("first_key", F.min(key).over(wk))
        .filter((F.col("c") > 1) & (key != F.col("first_key")))
        .select("doc_id", "p")
    )


def salted_dup(spark, sf_dir):
    """The alternative: salted partial agg -> final agg -> join back.
    No key ever assembles in one buffer; costs a second exchange and a
    double execution of the gram lineage."""
    from pyspark.sql import functions as F

    grams = _grams(spark, sf_dir)
    key = F.struct(F.col("doc_id").alias("d"), F.col("p").alias("i"))
    partial = (
        grams.withColumn(
            "salt", F.pmod(F.xxhash64("doc_id", "p"), F.lit(64))
        )
        .groupBy("gk", "salt")
        .agg(
            F.count(F.lit(1)).alias("c0"),
            F.min(key).alias("fk0"),
        )
    )
    final = partial.groupBy("gk").agg(
        F.sum("c0").alias("c"), F.min("fk0").alias("first_key")
    )
    return (
        grams.join(final, "gk")
        .filter((F.col("c") > 1) & (key != F.col("first_key")))
        .select("doc_id", "p")
    )


def _get_spark():
    # Own builder (not session.get_spark): the UI must be ON so spill
    # deltas can be read from the REST API.
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("hotgram-ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "32"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g")
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4047")
        .getOrCreate()
    )


def _spill(spark) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over all completed
    stages so far — caller takes deltas around a run."""
    app = spark.sparkContext.applicationId
    url = f"http://localhost:4047/api/v1/applications/{app}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return (0, 0)
    return (
        sum(s.get("memoryBytesSpilled", 0) for s in stages),
        sum(s.get("diskBytesSpilled", 0) for s in stages),
    )


def _read_steal() -> int:
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0
    except (OSError, ValueError):
        return 0


def verify(spark) -> None:
    """Both shapes produce the identical duplicate-position set on the
    planted sf0.1 fixture (cheap enough to collect)."""
    d = os.path.join(REPO, ".scale", "hotgram01")
    a = {(r.doc_id, r.p) for r in window_dup(spark, d).collect()}
    b = {(r.doc_id, r.p) for r in salted_dup(spark, d).collect()}
    assert a == b, f"shape mismatch: {len(a)} vs {len(b)} rows"
    print(f"verify ok: {len(a)} dup positions identical", file=sys.stderr)


def run(spark) -> None:
    out = {}
    for fixture in ("hotgram1", "hotgram3"):
        d = os.path.join(REPO, ".scale", fixture)
        for label, fn in (("window", window_dup), ("salted", salted_dup)):
            # one warmup on the small fixture for codegen
            fn(spark, os.path.join(REPO, ".scale", "hotgram01")).write.format(
                "noop"
            ).mode("overwrite").save()
            times, steals, spills = [], [], []
            for _ in range(REPS):
                sp0 = _spill(spark)
                s0 = _read_steal()
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 2))
                steals.append(_read_steal() - s0)
                sp1 = _spill(spark)
                spills.append(
                    {
                        "mem_mb": round((sp1[0] - sp0[0]) / 2**20, 1),
                        "disk_mb": round((sp1[1] - sp0[1]) / 2**20, 1),
                    }
                )
                spark.catalog.clearCache()
            out[f"{fixture}/{label}"] = {
                "reps": times,
                "steal": steals,
                "min": min(times),
                "median": round(statistics.median(times), 2),
                "spill": spills,
            }
            print(f"{fixture}/{label}: {out[f'{fixture}/{label}']}",
                  file=sys.stderr)
    print(json.dumps(out))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("plant", "all"):
        plant()
    if mode in ("verify", "run", "all"):
        spark = _get_spark()
        spark.sparkContext.setLogLevel("ERROR")
        if mode in ("verify", "all"):
            verify(spark)
        if mode in ("run", "all"):
            run(spark)


if __name__ == "__main__":
    main()
