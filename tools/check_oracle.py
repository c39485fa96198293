"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, then compares row count, column names, and
an order-insensitive multiset of normalized values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

REPO = "/root/repo"
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from pangenomesasgraphdatabases_spark.data import TABLES  # noqa: E402
from pangenomesasgraphdatabases_spark.session import get_spark  # noqa: E402


class ArrayOutput(Exception):
    """A list/array value reached the final projection — the driver's
    canonicalizer crashes on these (pandas 'unhashable type: list',
    VERDICT r1).  The local gate must be at least as strict."""


def norm_val(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # EXACT — the driver hash-compares values; round(…, 6) here
        # masked the r1 z-score failures (ADVICE r1).
        return v
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        raise ArrayOutput("array-typed output column (stringify it: "
                          "array_join/array_to_string)")
    if hasattr(v, "tolist"):  # numpy
        return norm_val(v.tolist())
    return v


# Canonical type families for the schema comparison (the driver
# records schema_match; name-only comparison would miss e.g. a VARCHAR
# oracle column against a BIGINT Spark column).
def _spark_type_family(dt: str) -> str:
    dt = dt.lower()
    if dt in ("tinyint", "smallint", "int", "bigint", "long", "integer"):
        return "int"
    if dt in ("float", "double") or dt.startswith("decimal"):
        return "float"
    if dt in ("string", "varchar"):
        return "str"
    if dt == "boolean":
        return "bool"
    if dt.startswith("timestamp"):
        return "ts"
    if dt == "date":
        return "date"
    return dt


def _duck_type_family(dt: str) -> str:
    dt = dt.upper()
    if dt in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "UBIGINT"):
        return "int"
    if dt in ("FLOAT", "DOUBLE", "REAL") or dt.startswith("DECIMAL"):
        return "float"
    if dt == "VARCHAR":
        return "str"
    if dt == "BOOLEAN":
        return "bool"
    if dt.startswith("TIMESTAMP"):
        return "ts"
    if dt == "DATE":
        return "date"
    return dt.lower()


def norm_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(norm_val(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) or None

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = dict(sdf.dtypes)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) — {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = dict(zip(dcols, (str(t) for t in rel.types)))
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            for c in scols:
                sf_fam = _spark_type_family(stypes[c])
                dk_fam = _duck_type_family(dtypes[c])
                if sf_fam != dk_fam:
                    problems.append(
                        f"type mismatch on {c}: spark {stypes[c]} ({sf_fam}) "
                        f"vs duck {dtypes[c]} ({dk_fam})"
                    )
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            try:
                ns, nd = norm_rows(srows, scols), norm_rows(drows, dcols)
            except ArrayOutput as e:
                problems.append(str(e))
            else:
                if ns != nd:
                    diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                    problems.append(f"values differ, e.g. {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
