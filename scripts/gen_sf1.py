#!/usr/bin/env python3
"""Generate a local sf1 dataset as 10 DISJOINT copies of sf0.1 — the
scaling fixture for SCALE.md (VERDICT r6 item 4: demonstrate, don't
assert, the 100x-scale claim).

Usage: python3 scripts/gen_sf1.py /root/testdata/sf0.1 /tmp/sf1 [copies]

Replication is disjoint BY CONSTRUCTION so the problem shape scales
linearly instead of quadratically:
- facts/dims that scale with sf (customer/supplier/part/orders/lineitem):
  every key column is offset by copy * (max_key + 1), so copy k joins only
  within copy k. nation/region stay fixed (25/5 rows at every TPC-H sf).
- documents: doc_id offset; every TOKEN gets a copy-specific suffix, so
  shingles/fingerprints never collide across copies — each copy carries
  exactly sf0.1's near-dup pair graph (10x docs -> 10x pairs, not 100x).
- embeddings: vec_id offset; each copy's vectors are multiplied by a
  copy-specific random +-1 sign pattern — an isometry that PRESERVES every
  within-copy dot product exactly while decorrelating cross-copy cosines
  (E[cos] = 0), so semantic-dedup density also scales linearly.
- events: event_id/user_id offset per copy; TIMESTAMPS are replicated
  verbatim, so the time window stays fixed and hour buckets gain N x rows
  at constant group cardinality — the shape of 10x traffic growth over
  the same period (not a longer history).
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_OFFSETS = {
    "customer": ["c_custkey", "c_nationkey:keep"],
    "supplier": ["s_suppkey", "s_nationkey:keep"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}


def max_key(tbl, col):
    return pc.max(tbl[col]).as_py()


def offset_copy(tbl, copy, maxes):
    cols = {}
    for name in tbl.column_names:
        arr = tbl[name]
        if name in maxes:
            arr = pc.add(arr, copy * (maxes[name] + 1))
        cols[name] = arr
    return pa.table(cols)


def salt_tokens(texts, copy):
    """Append _<copy> to every whitespace token (vectorized regex)."""
    if copy == 0:
        return texts
    return pc.replace_substring_regex(texts, r"(\S+)", rf"\1_{copy}")


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10
    # "shared-docs" mode: write ONLY the documents table, WITHOUT token
    # salting — doc ids stay disjoint but every copy carries the SAME
    # shingles, so shingle document-frequency grows with the copy count.
    # This is the adversarial corpus (boilerplate shared corpus-wide) that
    # makes inverted-index fan-out quadratic: the negative control for the
    # dfCap guard, the way the fixed-bucket semdedup rows are the negative
    # control for bucket scaling.
    shared_docs = len(sys.argv) > 4 and sys.argv[4] == "shared-docs"
    import os
    os.makedirs(dst, exist_ok=True)

    if shared_docs:
        docs = pq.read_table(f"{src}/documents.parquet")
        dmax = max_key(docs, "doc_id")
        parts = []
        for c in range(copies):
            cols = {}
            for name in docs.column_names:
                if name == "doc_id":
                    cols[name] = pc.add(docs[name], c * (dmax + 1))
                else:
                    cols[name] = docs[name]
            parts.append(pa.table(cols))
        pq.write_table(pa.concat_tables(parts), f"{dst}/documents.parquet")
        print("documents (shared shingles) ->", sum(p.num_rows for p in parts), "rows")
        return

    for t in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")

    for t, keys in KEY_OFFSETS.items():
        tbl = pq.read_table(f"{src}/{t}.parquet")
        off_cols = [k for k in keys if not k.endswith(":keep")]
        maxes = {k: max_key(tbl, k) for k in off_cols}
        # cross-copy FK domains (orders.o_custkey spans customer keys, etc.)
        if t == "orders":
            maxes["o_custkey"] = max_key(pq.read_table(f"{src}/customer.parquet"), "c_custkey")
        if t == "lineitem":
            maxes["l_orderkey"] = max_key(pq.read_table(f"{src}/orders.parquet"), "o_orderkey")
            maxes["l_partkey"] = max_key(pq.read_table(f"{src}/part.parquet"), "p_partkey")
            maxes["l_suppkey"] = max_key(pq.read_table(f"{src}/supplier.parquet"), "s_suppkey")
        parts = [offset_copy(tbl, c, maxes) for c in range(copies)]
        pq.write_table(pa.concat_tables(parts), f"{dst}/{t}.parquet")
        print(t, "->", sum(p.num_rows for p in parts), "rows")

    docs = pq.read_table(f"{src}/documents.parquet")
    dmax = max_key(docs, "doc_id")
    parts = []
    for c in range(copies):
        cols = {}
        for name in docs.column_names:
            if name == "doc_id":
                cols[name] = pc.add(docs[name], c * (dmax + 1))
            elif name == "text":
                cols[name] = salt_tokens(docs[name].combine_chunks(), c)
            else:
                cols[name] = docs[name]
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), f"{dst}/documents.parquet")
    print("documents ->", sum(p.num_rows for p in parts), "rows")

    emb = pq.read_table(f"{src}/embeddings.parquet")
    vmax = max_key(emb, "vec_id")
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    rng = np.random.default_rng(42)
    parts = []
    for c in range(copies):
        signs = np.ones(dim, dtype=np.float32) if c == 0 else \
            rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
        flipped = vecs * signs
        cols = {}
        for name in emb.column_names:
            if name == "vec_id":
                cols[name] = pc.add(emb[name], c * (vmax + 1))
            elif name == "embedding":
                cols[name] = pa.array(list(flipped), type=emb.schema.field("embedding").type)
            else:
                cols[name] = emb[name]
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), f"{dst}/embeddings.parquet")
    print("embeddings ->", sum(p.num_rows for p in parts), "rows")

    ev = pq.read_table(f"{src}/events.parquet")
    emax_id = max_key(ev, "event_id") if "event_id" in ev.column_names else None
    umax = max_key(ev, "user_id")
    parts = []
    for c in range(copies):
        cols = {}
        for name in ev.column_names:
            if name == "event_id" and emax_id is not None:
                cols[name] = pc.add(ev[name], c * (emax_id + 1))
            elif name == "user_id":
                cols[name] = pc.add(ev[name], c * (umax + 1))
            else:
                cols[name] = ev[name]
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), f"{dst}/events.parquet")
    print("events ->", sum(p.num_rows for p in parts), "rows")


if __name__ == "__main__":
    main()
