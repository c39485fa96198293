"""Long-subject extension-payload A/B for the builtin aligner
(VERDICT r12 #3).

The r12 seed_align shipped one candidate row PER (query, subject,
DIAGONAL), each carrying BOTH full sequences into the shuffle and the
Arrow batch — fine at the reference's ~1-knt cluster representatives,
but a hot megabase subject seeded on many diagonals replicates its
sequence once per diagonal.  r13 collapses candidates to one row per
(query, subject) PAIR carrying the diagonal list, so each pair's
sequences cross the shuffle exactly once.  This tool plants the
pathological fixture and measures both shapes:

* fixture: 8 subjects of 1 Mnt (LCG-generated ACGT).  128 queries,
  each the concatenation of 64 distinct 40-nt cuts of SUBJECT 0 at
  spread offsets — every query seeds subject 0 on 64 diagonals, so
  the per-diagonal shape ships 128 x 64 copies of the 1-Mnt sequence
  (~8 GB of payload) where the per-pair shape ships 128 (~130 MB).
* shapes, both producing the identical HSP set (verified by collect
  before timing; per-diagonal rows run the same island extension, and
  distinct diagonals can never emit identical HSP tuples, so the
  per-pair cross-diagonal dedup is a no-op between the shapes):
  - PAIR (shipped r13): operators.seed_align.builtin_blast_hits;
  - DIAG (the r12 shape, reconstructed): one row per (query, subject,
    diagonal), sequences joined per row.
* metrics: wall (reps, min, per-rep steal), shuffle write bytes and
  spill deltas from the UI REST API — the payload replication shows
  up directly in shuffle write.

Usage: python tools/seedalign_payload.py [verify|run|all]  (default
all).  The fixture is generated in-memory (deterministic LCG) — no
on-disk planting step.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SUBJECTS = 8
SUBJECT_LEN = 1_000_000
N_QUERIES = 128
CUTS_PER_QUERY = 64
CUT_LEN = 40
REPS = 3
_BASES = "ACGT"


def _lcg_seq(seed: int, n: int) -> str:
    x = seed
    out = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % 2**64
        out.append(_BASES[(x >> 33) & 3])
    return "".join(out)


def _fixture(spark):
    subjects = [(f"s{i}", _lcg_seq(1000 + i, SUBJECT_LEN))
                for i in range(N_SUBJECTS)]
    hot = subjects[0][1]
    queries = []
    for qi in range(N_QUERIES):
        # 64 cuts at offsets spread over the megabase, shifted per
        # query so diagonals differ across queries too
        cuts = []
        for k in range(CUTS_PER_QUERY):
            off = (1000 + k * 15000 + qi * 37) % (SUBJECT_LEN - CUT_LEN)
            cuts.append(hot[off:off + CUT_LEN])
        queries.append((f"q{qi}", "".join(cuts)))
    q = spark.createDataFrame(queries, ["query_id", "sequence"])
    s = spark.createDataFrame(subjects, ["subject_id", "sequence"])
    return q.repartition(32), s.repartition(8)


def pair_hits(q, s):
    """The shipped r13 shape: one payload row per (query, subject)."""
    from pangenomesasgraphdatabases_spark.operators.seed_align import (
        builtin_blast_hits,
    )

    return builtin_blast_hits(q, s)


def diag_hits(q, s, word_size=11, xdrop=20, min_score=28, max_kmer_df=64):
    """The r12 shape: one payload row per (query, subject, diagonal),
    sequences joined per row — same island extension so the output is
    identical; only the payload replication differs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pangenomesasgraphdatabases_spark.operators.seed_align import (
        _HIT_SCHEMA,
        _kmers,
        _seed_islands,
        _xdrop_extend,
    )

    qk = _kmers(q, "query_id", word_size, "q_pos")
    sk = _kmers(s, "subject_id", word_size, "s_pos")
    sk = sk.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("kmer"))
    ).filter(F.col("_df") <= max_kmer_df)
    seeds = qk.join(sk, "kmer").select(
        "query_id",
        "subject_id",
        (F.col("s_pos") - F.col("q_pos")).alias("diag"),
        "q_pos",
    )
    per_diag = seeds.groupBy("query_id", "subject_id", "diag").agg(
        F.sort_array(F.collect_set("q_pos")).alias("qpos")
    )
    with_seqs = per_diag.join(
        q.select("query_id", F.col("sequence").alias("_qs")), "query_id"
    ).join(
        s.select("subject_id", F.col("sequence").alias("_ss")), "subject_id"
    )
    merge_gap = word_size + xdrop // 2

    def extend(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for qid, sid, diag, qpos, qs, ss in zip(
                pdf["query_id"], pdf["subject_id"], pdf["diag"],
                pdf["qpos"], pdf["_qs"], pdf["_ss"],
            ):
                seen = set()
                for i0 in _seed_islands([int(p) for p in qpos], merge_gap):
                    hsp = _xdrop_extend(qs, ss, int(diag), i0, xdrop)
                    if hsp is not None and hsp not in seen:
                        seen.add(hsp)
                        rows.append((qid, sid) + hsp)
            yield pd.DataFrame(
                rows,
                columns=["query_id", "subject_id", "q_start", "s_start",
                         "align_len", "n_matches", "score"],
            )

    hits = with_seqs.mapInPandas(extend, _HIT_SCHEMA)
    return hits.filter(F.col("score") >= F.lit(min_score))


def _get_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("seedalign-payload-ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g")
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4048")
        .getOrCreate()
    )


def _stage_totals(spark) -> tuple[int, int, int]:
    """(shuffleWriteBytes, memoryBytesSpilled, diskBytesSpilled) summed
    over completed stages — caller takes deltas around a run."""
    app = spark.sparkContext.applicationId
    url = (
        f"http://localhost:4048/api/v1/applications/{app}"
        "/stages?status=complete"
    )
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return (0, 0, 0)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
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


def verify(spark, q, s) -> int:
    a = {tuple(r) for r in pair_hits(q, s).collect()}
    b = {tuple(r) for r in diag_hits(q, s).collect()}
    assert a == b, f"shape mismatch: {len(a)} vs {len(b)} rows"
    print(f"verify ok: {len(a)} HSPs identical across shapes",
          file=sys.stderr)
    return len(a)


def run(spark, q, s) -> None:
    out = {}
    for label, fn in (("pair", pair_hits), ("diag", diag_hits)):
        times, steals, writes, spills = [], [], [], []
        for _ in range(REPS):
            w0 = _stage_totals(spark)
            s0 = _read_steal()
            t0 = time.time()
            fn(q, s).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
            steals.append(_read_steal() - s0)
            w1 = _stage_totals(spark)
            writes.append(round((w1[0] - w0[0]) / 2**20, 1))
            spills.append(
                {"mem_mb": round((w1[1] - w0[1]) / 2**20, 1),
                 "disk_mb": round((w1[2] - w0[2]) / 2**20, 1)}
            )
            spark.catalog.clearCache()
        out[label] = {
            "reps": times,
            "min": min(times),
            "median": round(statistics.median(times), 2),
            "steal": steals,
            "shuffle_write_mb": writes,
            "spill": spills,
        }
        print(f"{label}: {out[label]}", file=sys.stderr)
    print(json.dumps(out))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    q, s = _fixture(spark)
    q.persist().count()
    s.persist().count()
    if mode in ("verify", "all"):
        verify(spark, q, s)
    if mode in ("run", "all"):
        run(spark, q, s)


if __name__ == "__main__":
    main()
