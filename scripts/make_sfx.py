#!/usr/bin/env python
"""Build the round-6 measurement corpus: an N×-inflated copy of an sf dir
(default sf0.1 → 10× ≈ the driver's sf1.0 row counts) so scale-shape
behavior can be rehearsed locally. Replication preserves the %100 probe-id
sets (documents/embeddings offsets are multiples of the table size, which
is a multiple of 100) and the lineitem/orders orderkey join. Pure
pyarrow — no Spark session needed.

    python scripts/make_sfx.py [--src /root/testdata/sf0.1] [--dst /tmp/sfx1] [--factor 10]

Timing-only data: text replicates verbatim (identical-set BM25 probes
collapse under the query-set dedup — re-probe with distinct synthetic sets
for that axis, see OPTIMIZATION_r06.md)."""

from __future__ import annotations

import argparse
import os


def main() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sfx1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    def replicate(name: str, id_col: str, offset: int) -> None:
        t = pq.read_table(f"{args.src}/{name}.parquet")
        reps = []
        for k in range(args.factor):
            reps.append(
                t.set_column(
                    t.schema.get_field_index(id_col),
                    id_col,
                    pc.add(t.column(id_col), k * offset),
                )
            )
        pq.write_table(pa.concat_tables(reps), f"{args.dst}/{name}.parquet")

    docs = pq.read_table(f"{args.src}/documents.parquet")
    emb = pq.read_table(f"{args.src}/embeddings.parquet")
    li = pq.read_table(f"{args.src}/lineitem.parquet")
    max_order = pc.max(li.column("l_orderkey")).as_py() + 1
    replicate("documents", "doc_id", docs.num_rows)
    replicate("embeddings", "vec_id", emb.num_rows)
    replicate("lineitem", "l_orderkey", max_order)
    replicate("orders", "o_orderkey", max_order)
    for name in ("customer", "supplier", "nation", "region", "part", "events"):
        pq.write_table(
            pq.read_table(f"{args.src}/{name}.parquet"), f"{args.dst}/{name}.parquet"
        )
    print(f"wrote {args.factor}x of {args.src} to {args.dst}")


if __name__ == "__main__":
    main()
