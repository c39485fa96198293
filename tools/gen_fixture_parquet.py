"""Materialize the deterministic pangenome fixture as parquet so both
Spark queries and DuckDB oracles can read identical inputs.

Output: /root/repo/fixtures_data/{feature_nodes,cluster_nodes,
composition}.parquet (tiny; committed to the repo).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, "/root/repo")

from pangenomesasgraphdatabases_spark.graph.fixtures import build_fixture

OUT = pathlib.Path("/root/repo/fixtures_data")


def main() -> None:
    OUT.mkdir(exist_ok=True)
    fx = build_fixture()
    fx.feature_nodes.to_parquet(OUT / "feature_nodes.parquet", index=False)
    fx.cluster_nodes.to_parquet(OUT / "cluster_nodes.parquet", index=False)
    fx.composition.to_parquet(OUT / "composition.parquet", index=False)
    print("wrote", sorted(p.name for p in OUT.iterdir()))


if __name__ == "__main__":
    main()
