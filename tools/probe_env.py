"""Probe: are the driver-checked queries bit-stable under a HOSTILE
SparkSession config?  The external driver runs our ``queries()`` with
its own session — we don't control its timezone, parallelism, or Arrow
setting.  This runs each named query under two deliberately different
sessions and compares canonical value multisets.

Usage: python tools/probe_env.py [sf_dir] [query ...]
"""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)

QUERIES = sys.argv[2:] or [
    "gi_scan_flagship",
    "events_tumbling_counts",
    "events_sliding_avg",
    "stream_tumbling_counts",
    "emb_label_stats",
    "zscore_vs_group",
]
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

WORKER = r"""
import sys, json, hashlib
sys.path.insert(0, "/root/repo")
mode, sf = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
from pyspark.sql import SparkSession
if mode == "hostile":
    b = (SparkSession.builder.master("local[7]")
         .appName("probe-hostile")
         .config("spark.sql.shuffle.partitions", "7")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.sql.execution.arrow.pyspark.enabled", "false")
         .config("spark.default.parallelism", "7")
         .config("spark.ui.enabled", "false"))
else:
    b = (SparkSession.builder.master("local[32]")
         .appName("probe-std")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false"))
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em
qs = em.queries()
out = {}
for n in names:
    df = qs[n](spark, sf)
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(repr(v) for v in rec)
        for rec in pdf[cols].itertuples(index=False, name=None)
    )
    h = hashlib.sha256(repr(rows).encode()).hexdigest()
    out[n] = {"rows": len(pdf), "hash": h,
              "dtypes": {c: str(pdf[c].dtype) for c in cols}}
print(json.dumps(out))
"""


def run(mode: str) -> dict:
    import json

    r = subprocess.run(
        [sys.executable, "-c", WORKER, mode, SF, *QUERIES],
        capture_output=True, text=True, timeout=600,
    )
    if r.returncode != 0:
        print(r.stderr[-3000:])
        raise SystemExit(f"{mode} worker failed")
    return json.loads(r.stdout.strip().splitlines()[-1])


std = run("std")
hostile = run("hostile")
bad = 0
for n in QUERIES:
    s, h = std[n], hostile[n]
    ok = s == h
    bad += not ok
    print(f"{'OK  ' if ok else 'DIFF'} {n}: std={s['rows']}r {s['hash'][:12]} "
          f"hostile={h['rows']}r {h['hash'][:12]}")
    if not ok and s["dtypes"] != h["dtypes"]:
        print(f"     dtypes std={s['dtypes']} hostile={h['dtypes']}")
print("env-sensitive queries:", bad)
sys.exit(1 if bad else 0)
