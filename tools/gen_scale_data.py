"""Generate a ~10x scale point from the driver's sf0.1 testdata.

The driver ships sf{0.001,0.01,0.1}; the 100x-scale grade otherwise
rests on plan reading alone (VERDICT r5 #5).  This script builds a
self-made sf1-equivalent for the tables the heavy queries read —
documents, embeddings, events — under ``.scale/sf1/`` (gitignored),
without touching ``/root/testdata``.

Scaling must preserve WORKLOAD SHAPE, not just row count:

* documents: 10 copies, ids offset; copy k applies a Caesar rotation
  by k to all ASCII letters.  A rotation is a bijection on tokens and
  n-grams, so WITHIN each copy the near-dup/exact-dup structure (and
  every Jaccard value) is exactly preserved — dup rate stays constant
  per row — while ACROSS copies texts share (almost) no n-grams, so
  the candidate-pair graph scales ~10x rather than exploding 45x the
  way verbatim copies would (every doc would near-dup its 9 clones).
* embeddings: 10 copies, ids offset; copy k rolls the vector by k
  positions.  Norms and within-copy pairwise angles are untouched;
  cross-copy similarity is scrambled.  Distribution (and therefore
  k-means/IVF cell balance) is preserved.
* events: 10 copies; ids and user ids offset (10x users — the
  sessionize/rate-limit keys), timestamps shifted k*17 s (range and
  bucket count preserved; 10x rows per bucket).

Deterministic end to end — no RNG, no clocks.

Usage: python tools/gen_scale_data.py [src_sf_dir] [out_dir] [copies]
"""

from __future__ import annotations

import os
import string
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
)
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

DOC_ID_STRIDE = 1_000_000
VEC_ID_STRIDE = 1_000_000
EVENT_ID_STRIDE = 100_000_000
USER_ID_STRIDE = 1_000_000
ORDER_KEY_STRIDE = 100_000_000


def _rot_alphabet(k: int) -> tuple[str, str]:
    lo, up = string.ascii_lowercase, string.ascii_uppercase
    return lo + up, lo[k:] + lo[:k] + up[k:] + up[:k]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    parts = []
    for k in range(COPIES):
        src_ab, dst_ab = _rot_alphabet(k % 26)
        parts.append(
            f"""SELECT doc_id + {k * DOC_ID_STRIDE} AS doc_id,
                   translate(text, '{src_ab}', '{dst_ab}') AS text,
                   lang, source, n_chars
            FROM read_parquet('{SRC}/documents.parquet')"""
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/documents.parquet' (FORMAT PARQUET)"
    )

    parts = []
    for k in range(COPIES):
        r = k % 64
        if r == 0:
            emb = "embedding"
        else:
            emb = (
                f"list_concat(embedding[{r + 1}:64], embedding[1:{r}])"
            )
        parts.append(
            f"""SELECT vec_id + {k * VEC_ID_STRIDE} AS vec_id,
                   CAST({emb} AS FLOAT[]) AS embedding, label
            FROM read_parquet('{SRC}/embeddings.parquet')"""
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)"
    )

    parts = []
    for k in range(COPIES):
        parts.append(
            f"""SELECT event_id + {k * EVENT_ID_STRIDE} AS event_id,
                   ts + INTERVAL {k * 17} SECOND AS ts,
                   user_id + {k * USER_ID_STRIDE} AS user_id,
                   event_type, value, props
            FROM read_parquet('{SRC}/events.parquet')"""
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/events.parquet' (FORMAT PARQUET)"
    )

    # lineitem + orders: 10 copies with offset order keys and
    # UNCHANGED part/supp keys and dates — basket-size distribution,
    # per-part frequencies, and the date range are preserved, so
    # basket pairs see 10x support per pair and the interval sweep
    # sees 10x concurrent intervals over the same day spine (the
    # workload-shape analogue of the documents Caesar trick).
    parts = []
    for k in range(COPIES):
        parts.append(
            f"""SELECT l_orderkey + {k * ORDER_KEY_STRIDE} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet')"""
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)"
    )

    parts = []
    for k in range(COPIES):
        parts.append(
            f"""SELECT o_orderkey + {k * ORDER_KEY_STRIDE} AS o_orderkey,
                   o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet')"""
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{OUT}/orders.parquet' (FORMAT PARQUET)"
    )

    # Dimension tables ride along UNCHANGED: they are the broadcast
    # side everywhere (part/supplier/customer/nation/region), and a
    # 10x fact table against fixed dimensions is exactly the shape of
    # real growth — facts accrete, dimensions don't.
    for t in ("part", "supplier", "customer", "nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t in (
        "documents", "embeddings", "events", "lineitem", "orders",
        "part", "supplier", "customer", "nation", "region",
    ):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {OUT}/{t}.parquet")


if __name__ == "__main__":
    main()
