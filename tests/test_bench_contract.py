"""Contract guards for bench.py — the driver parses its stdout and
BENCH_r{N}.json is the authoritative perf series, so drift here is a
silent loss of the perf gate (round 6 lost its parsed bench to an
oversized stdout line; a renamed query would silently drop from the
headline set because the run loop `registry.get(name)`-skips)."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_names_all_registered():
    """Every HEADLINE entry must resolve in the registry — a rename
    or removal must fail here, not silently shrink the bench."""
    from pangenomesasgraphdatabases_spark.queries.registry import all_queries

    bench = _load_bench()
    registry = all_queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, f"headline queries not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline"


def test_read_steal_is_nonnegative_int():
    """The per-rep steal annotation must degrade to 0, never raise —
    it wraps every timed rep."""
    bench = _load_bench()
    s = bench._read_steal()
    assert isinstance(s, int)
    assert s >= 0


def test_compact_line_stays_parseable():
    """The compact stdout line for the CURRENT headline set must stay
    far under the driver's tail capture (~1.5 KB budget, VERDICT r6
    #1).  Rendered with worst-case 4-digit-seconds values."""
    import json

    bench = _load_bench()
    queries = {n: 9999.999 for n in bench.HEADLINE}
    queries["graph_build_770x6000"] = 9999.999
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 99999.999,
            "unit": "sec",
            "queries": queries,
            "build_min_sec": 9999.999,
            "sf": 0.1,
        }
    )
    assert len(line) <= 1500, f"compact bench line {len(line)} B > 1.5 KB budget"
