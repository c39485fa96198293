"""Sequence-function unit + property tests (SURVEY.md section 5.3)."""

from __future__ import annotations

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pangenomesasgraphdatabases_spark.functions.sequence import (
    cai_py,
    delta_decode_py,
    delta_encode,
    delta_encode_py,
    gc_content,
)

DNA = "ACGT-"


def test_delta_encode_identical():
    assert delta_encode_py("ACGT", "ACGT") == ""


def test_delta_encode_known():
    # diff at index 1 (C->G) and index 3 (T->A): "1G2A"
    assert delta_encode_py("AGGA", "ACGT") == "1G2A"


def test_delta_decode_known():
    assert delta_decode_py("1G2A", "ACGT") == "AGGA"


def test_delta_decode_strips_gaps():
    assert delta_decode_py("", "AC-GT") == "ACGT"
    assert delta_decode_py(None, "AC-GT") == "ACGT"


@given(
    st.lists(st.sampled_from(DNA), min_size=1, max_size=60),
    st.randoms(use_true_random=False),
)
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(ref_chars, rnd):
    """decode(encode(s, ref), ref) == s.replace('-','') for equal-length
    sequences (SURVEY.md section 5 property test)."""
    ref = "".join(ref_chars)
    seq = "".join(rnd.choice("ACGT") for _ in ref)
    var = delta_encode_py(seq, ref)
    assert delta_decode_py(var, ref) == seq.replace("-", "")


def test_pandas_udf_matches_py(spark):
    rng = random.Random(7)
    rows = []
    for i in range(50):
        ref = "".join(rng.choice("ACGT") for _ in range(30))
        seq = "".join(
            c if rng.random() < 0.8 else rng.choice("ACGT") for c in ref
        )
        rows.append((seq, ref))
    df = spark.createDataFrame(rows, ["seq", "ref"])
    got = df.select("seq", "ref", delta_encode("seq", "ref").alias("v")).collect()
    for r in got:
        assert r.v == delta_encode_py(r.seq, r.ref)


def test_gc_content_expr(spark):
    df = spark.createDataFrame([("GCGC",), ("ATAT",), ("GCAT",), ("gcsa",)], ["seq"])
    vals = [r.pct for r in df.select(gc_content("seq").alias("pct")).collect()]
    assert vals == [100.0, 0.0, 50.0, 75.0]


def test_cai_stub():
    assert cai_py(None) is None
    assert cai_py("NNN") is None
    v = cai_py("ATGGCC")
    assert v is not None and 0 < v <= 1
