"""Build the edge-input fixture dirs for the crash sweep (tools/fuzz_edges.py):

  (a) <out>/sf_empty — every testdata table with IDENTICAL schema but zero
      rows (what a fully-filtered or not-yet-landed partition looks like);
  (b) <out>/sf_nulls — small slices of every table with ~10% nulls injected
      into every non-key column of the fact/dimension tables (events,
      documents, embeddings, orders, lineitem, part, customer, supplier)
      — what a real web corpus looks like (missing text, missing
      embeddings, null props, null measures/dates/labels). Identity and
      join keys stay non-null.

Deterministic (seeded), derived from /root/testdata — no external data.

Usage: python tools/make_edge_fixtures.py [src_sf_dir] [out_root]
       (defaults: /root/testdata/sf0.001  /tmp)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
# identity + join keys stay non-null (a production pipeline enforces
# key integrity at ingest; everything else is fair game)
KEY_COLS = {
    "event_id", "doc_id", "vec_id", "user_id",
    "o_orderkey", "o_custkey", "c_custkey", "c_nationkey",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "p_partkey", "s_suppkey", "s_nationkey",
    "n_nationkey", "n_regionkey", "r_regionkey",
}
NULLED_TABLES = (
    "events", "documents", "embeddings",
    "orders", "lineitem", "part", "customer", "supplier",
)


def build(src: str, out_root: str) -> tuple[str, str]:
    out_e = os.path.join(out_root, "sf_empty")
    os.makedirs(out_e, exist_ok=True)
    for t in TABLES:
        sch = pq.read_schema(f"{src}/{t}.parquet").remove_metadata()
        pq.write_table(sch.empty_table(), f"{out_e}/{t}.parquet")

    out_n = os.path.join(out_root, "sf_nulls")
    os.makedirs(out_n, exist_ok=True)
    rng = np.random.RandomState(7)
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        n = min(tab.num_rows, 400)
        tab = tab.slice(0, n)
        if t in NULLED_TABLES and n:
            cols = []
            for i, f in enumerate(tab.schema):
                col = tab.column(i)
                if f.name in KEY_COLS:
                    cols.append(col)
                    continue
                mask = rng.rand(n) < 0.10
                vals = col.combine_chunks().to_pylist()
                for j in np.flatnonzero(mask):
                    vals[j] = None
                cols.append(pa.array(vals, type=f.type))
            tab = pa.table(dict(zip(tab.schema.names, cols)))
        pq.write_table(tab, f"{out_n}/{t}.parquet")
    return out_e, out_n


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    print("built", *build(src, out_root))
