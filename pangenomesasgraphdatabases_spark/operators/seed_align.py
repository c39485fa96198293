"""Builtin seed-and-extend nucleotide aligner — the no-binary answer
to the S11 boundary (reference extendingDB_performingBlast.py:63-105
shells out to ``blastn``; this container ships no BLAST, so the last
"missing" residue was an environment wall).

The BLAST algorithm itself is public and maps naturally onto Spark:

1. **Seeding** is an inverted-index EQUI-JOIN: every ``word_size``-mer
   of every query joins every identical k-mer of every subject — the
   same shuffle-on-content-key shape as the LSH/shingle dedup family,
   never a pairwise scan of query x subject.
2. **Overrepresented-word masking** (BLAST's low-complexity guard,
   and this engine's hot-key discipline): k-mers whose subject-side
   occurrence count exceeds ``max_kmer_df`` are dropped from seeding
   via one window over the k-mer key — a poly-A run cannot become a
   quadratic join key.  Dropped-seed recall loss is the documented
   BLAST trade, not a silent failure: the cap is a parameter.
3. **Diagonal grouping**: seed hits collapse per
   (query, subject, s_pos - q_pos); one candidate row per diagonal.
4. **Extension** is embarrassingly parallel: each candidate row
   carries its two sequences into an Arrow-batched ``mapInPandas``
   and runs classic ungapped X-drop extension from the seed.

Scoring is the public blastn default for ungapped nucleotide
alignment (match +1 / mismatch -2) with Karlin-Altschul statistics
(lambda = 1.28, K = 0.46 for that matrix — NCBI's published ungapped
values): ``bit = (lambda*S - ln K) / ln 2``,
``evalue = m*n / 2^bit`` with effective lengths simplified to the
raw pair lengths (documented simplification; the reference pipeline
only thresholds and ranks, which this preserves).  The ungapped path
is the default — the reference's virus-screen use case is
high-identity hit detection, where ungapped HSPs carry the signal —
and :func:`builtin_blast_hits_gapped` adds indel tolerance via
banded Smith-Waterman around the best-seeded diagonal (raw-score
ranking; published ungapped lambda/K do not apply to gapped scores).
``run_blastn`` remains the exact-parity path when a binary exists.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Ungapped blastn defaults (+1/-2) and their published Karlin-Altschul
# parameters.
MATCH = 1
MISMATCH = -2
KA_LAMBDA = 1.28
KA_K = 0.46

_HIT_SCHEMA = (
    "query_id string, subject_id string, q_start int, s_start int, "
    "align_len int, n_matches int, score int"
)


def _kmers(seqs: DataFrame, id_col: str, word_size: int, pos_col: str) -> DataFrame:
    """(id, pos, kmer) for every ``word_size`` window — JVM-side
    explode over substring, the gram idiom of the dedup family."""
    return (
        seqs.filter(F.length("sequence") >= word_size)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.lit(1), F.length("sequence") - (word_size - 1)
                )
            ).alias(pos_col),
            "sequence",
        )
        .select(
            id_col,
            pos_col,
            F.substring("sequence", F.col(pos_col), word_size).alias("kmer"),
        )
    )


def builtin_blast_hits(
    queries: DataFrame,
    subjects: DataFrame,
    word_size: int = 11,
    xdrop: int = 20,
    min_score: int = 28,
    max_kmer_df: int = 64,
) -> DataFrame:
    """Ungapped seed-and-extend hits between ``queries`` and
    ``subjects`` (both ``(.., sequence)`` frames with ``query_id`` /
    ``subject_id``).  Returns one best HSP per (query, subject,
    diagonal) with ``score >= min_score``, anchored at the
    diagonal's FIRST seed — a later, disjoint homology island on the
    same diagonal (separated by a > xdrop junk gap) is not re-seeded
    (BLAST extends every seed; one-anchor-per-diagonal is the
    documented simplification, sufficient for the hit-detection /
    ranking use the reference pipeline makes of blastn):

    ``(query_id, subject_id, q_start, s_start, align_len, n_matches,
    score)`` — 1-based starts, integer raw score under +1/-2.

    Use :func:`with_bitscore` to attach bit score / e-value columns
    for the ``enrich_clusters_with_blast`` surface."""
    qk = _kmers(queries, "query_id", word_size, "q_pos")
    sk = _kmers(subjects, "subject_id", word_size, "s_pos")
    # BLAST-style overrepresented-word mask: one window over the
    # k-mer key (the measured window-over-key pattern) instead of a
    # groupBy + join-back.
    sk = sk.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("kmer"))
    ).filter(F.col("_df") <= max_kmer_df)
    seeds = qk.join(sk, "kmer").select(
        "query_id",
        "subject_id",
        (F.col("s_pos") - F.col("q_pos")).alias("diag"),
        "q_pos",
    )
    cand = seeds.groupBy("query_id", "subject_id", "diag").agg(
        F.min("q_pos").alias("seed_qpos")
    )
    with_seqs = cand.join(
        queries.select("query_id", F.col("sequence").alias("_qs")),
        "query_id",
    ).join(
        subjects.select("subject_id", F.col("sequence").alias("_ss")),
        "subject_id",
    )

    def extend(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for qid, sid, diag, seed_qpos, qs, ss in zip(
                pdf["query_id"],
                pdf["subject_id"],
                pdf["diag"],
                pdf["seed_qpos"],
                pdf["_qs"],
                pdf["_ss"],
            ):
                diag = int(diag)
                i0 = int(seed_qpos) - 1  # 0-based query index
                j0 = i0 + diag  # 0-based subject index
                nq, ns = len(qs), len(ss)

                def step(i: int) -> int:
                    return MATCH if qs[i] == ss[i + diag] else MISMATCH

                # right extension from the seed start (the seed is
                # all-match by construction, re-scored as part of the
                # sweep)
                best = score = 0
                best_r = i0 - 1
                i = i0
                while i < nq and i + diag < ns:
                    score += step(i)
                    if score > best:
                        best, best_r = score, i
                    if best - score > xdrop:
                        break
                    i += 1
                right = best
                # left extension
                best = score = 0
                best_l = i0
                i = i0 - 1
                while i >= 0 and i + diag >= 0:
                    score += step(i)
                    if score > best:
                        best, best_l = score, i
                    if best - score > xdrop:
                        break
                    i -= 1
                total = right + best
                if total < 1 or best_r < best_l:
                    continue
                length = best_r - best_l + 1
                n_matches = (total + 2 * length) // 3  # s = m - 2(L-m)
                rows.append(
                    (
                        qid,
                        sid,
                        best_l + 1,
                        best_l + diag + 1,
                        length,
                        n_matches,
                        total,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "query_id",
                    "subject_id",
                    "q_start",
                    "s_start",
                    "align_len",
                    "n_matches",
                    "score",
                ],
            )

    hits = with_seqs.mapInPandas(extend, _HIT_SCHEMA)
    return hits.filter(F.col("score") >= F.lit(min_score))


def with_bitscore(hits: DataFrame, m: int, n: int) -> DataFrame:
    """Attach Karlin-Altschul bit score and e-value columns (ungapped
    +1/-2 parameters; ``m``/``n`` are the query/database lengths the
    e-value search space uses — raw lengths, the documented
    simplification)."""
    bit = (KA_LAMBDA * F.col("score") - math.log(KA_K)) / math.log(2.0)
    return hits.withColumn("bit_score", bit).withColumn(
        "evalue", F.lit(float(m)) * F.lit(float(n)) * F.pow(F.lit(2.0), -bit)
    )


def builtin_hits_as_blast_table(hits_with_bits: DataFrame) -> DataFrame:
    """Adapter to the ``blast_hits_from_xml`` output surface so
    ``enrich_clusters_with_blast`` runs unchanged on builtin hits:
    (cluster_id, title, score, evalue)."""
    return hits_with_bits.select(
        F.col("query_id").alias("cluster_id"),
        F.col("subject_id").alias("title"),
        F.round("bit_score", 2).alias("score"),
        "evalue",
    )


def _banded_sw(
    qs: str,
    ss: str,
    diag: int,
    band: int,
    gap: int,
) -> tuple[int, int, int, int, int, int, int] | None:
    """Banded local alignment (Smith-Waterman, linear gap penalty)
    restricted to diagonals ``[diag - band, diag + band]`` — O(|q| *
    band) time and memory, the classic post-seeding refinement.
    Returns (q_start, s_start, align_len, n_matches, score, gaps),
    1-based starts, or None when nothing scores above 0.  Parallel DP
    tables carry match counts, gap counts, column counts and path
    origins so identity is exact without a traceback pass."""
    nq, ns = len(qs), len(ss)
    width = 2 * band + 1
    NEG = -(10**9)
    # per-cell: score, matches, gaps, cols, origin (qi, ji)
    H = [NEG] * width
    Mt = [0] * width
    Gp = [0] * width
    Cl = [0] * width
    Org = [(0, 0)] * width
    best = (0, None)  # (score, payload)
    for i in range(nq):
        nH = [NEG] * width
        nM = [0] * width
        nG = [0] * width
        nC = [0] * width
        nO = [(0, 0)] * width
        base_j = i + diag - band
        for k in range(width):
            j = base_j + k
            if j < 0 or j >= ns:
                continue
            m = MATCH if qs[i] == ss[j] else MISMATCH
            # start a new local path here
            sc, mt, gp, cl, org = m, int(m > 0), 0, 1, (i, j)
            # diagonal move: H[k] is (i-1, j-1) in the previous row
            if H[k] > NEG and H[k] + m > sc:
                sc = H[k] + m
                mt, gp, cl = Mt[k] + int(m > 0), Gp[k], Cl[k] + 1
                org = Org[k]
            # up (gap in subject): (i-1, j) = previous row, k+1
            if k + 1 < width and H[k + 1] > NEG and H[k + 1] + gap > sc:
                sc = H[k + 1] + gap
                mt, gp, cl = Mt[k + 1], Gp[k + 1] + 1, Cl[k + 1] + 1
                org = Org[k + 1]
            # left (gap in query): (i, j-1) = current row, k-1
            if k - 1 >= 0 and nH[k - 1] > NEG and nH[k - 1] + gap > sc:
                sc = nH[k - 1] + gap
                mt, gp, cl = nM[k - 1], nG[k - 1] + 1, nC[k - 1] + 1
                org = nO[k - 1]
            if sc < 0:
                continue
            nH[k], nM[k], nG[k], nC[k], nO[k] = sc, mt, gp, cl, org
            if sc > best[0]:
                best = (sc, (org[0] + 1, org[1] + 1, cl, mt, sc, gp))
        H, Mt, Gp, Cl, Org = nH, nM, nG, nC, nO
    return best[1]


def builtin_blast_hits_gapped(
    queries: DataFrame,
    subjects: DataFrame,
    word_size: int = 11,
    band: int = 8,
    gap: int = -3,
    min_score: int = 28,
    max_kmer_df: int = 64,
) -> DataFrame:
    """Gapped variant of :func:`builtin_blast_hits`: the same
    inverted-index seeding and overrepresented-word cap, but
    candidates collapse to ONE best-seeded diagonal per (query,
    subject) and refine with banded Smith-Waterman (± ``band``
    diagonals, linear ``gap`` penalty) — indel-tolerant HSPs the
    ungapped X-drop cannot produce.  Output adds a ``gaps`` column;
    scores are raw +1/-2/gap (the published Karlin-Altschul ungapped
    lambda/K do not apply to gapped scores, so rank/threshold on the
    raw score — exactly how the reference pipeline consumes hits).

    Scale shape: identical to the ungapped path until extension (the
    join IS the work); the banded DP is O(|q| * band) per candidate
    pair inside the same Arrow-batched ``mapInPandas``."""
    qk = _kmers(queries, "query_id", word_size, "q_pos")
    sk = _kmers(subjects, "subject_id", word_size, "s_pos")
    sk = sk.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("kmer"))
    ).filter(F.col("_df") <= max_kmer_df)
    seeds = qk.join(sk, "kmer").select(
        "query_id",
        "subject_id",
        (F.col("s_pos") - F.col("q_pos")).alias("diag"),
    )
    diag_counts = seeds.groupBy("query_id", "subject_id", "diag").agg(
        F.count(F.lit(1)).alias("n_seeds")
    )
    # best-seeded diagonal per pair (ties: lowest diagonal)
    cand = (
        diag_counts.groupBy("query_id", "subject_id")
        .agg(
            F.max(
                F.struct(F.col("n_seeds"), (-F.col("diag")).alias("nd"))
            ).alias("m")
        )
        .select("query_id", "subject_id", (-F.col("m.nd")).alias("diag"))
    )
    with_seqs = cand.join(
        queries.select("query_id", F.col("sequence").alias("_qs")),
        "query_id",
    ).join(
        subjects.select("subject_id", F.col("sequence").alias("_ss")),
        "subject_id",
    )

    def extend(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for qid, sid, diag, qs, ss in zip(
                pdf["query_id"],
                pdf["subject_id"],
                pdf["diag"],
                pdf["_qs"],
                pdf["_ss"],
            ):
                r = _banded_sw(qs, ss, int(diag), band, gap)
                if r is None:
                    continue
                q_start, s_start, cl, mt, sc, gp = r
                rows.append((qid, sid, q_start, s_start, cl, mt, sc, gp))
            yield pd.DataFrame(
                rows,
                columns=[
                    "query_id",
                    "subject_id",
                    "q_start",
                    "s_start",
                    "align_len",
                    "n_matches",
                    "score",
                    "gaps",
                ],
            )

    hits = with_seqs.mapInPandas(extend, _HIT_SCHEMA + ", gaps int")
    return hits.filter(F.col("score") >= F.lit(min_score))
