#!/usr/bin/env python3
"""Deterministic large-SF testdata generator (driver-side tool).

Scales a driver-generated sf dir (default /root/testdata/sf0.1) by an
integer factor R (default 10 -> "sf1": 6M lineitem / 50k docs / 20k
embeddings, the same shape as the round-6 sf1 gate) via key-offset
replication:

  - region/nation are fixed dimensions: copied once.
  - every other table is replicated R times; replica i offsets each
    key column by i * stride where stride = the source table's dense
    0-based key count, so keys stay dense and FK joins stay exact
    (orders.o_custkey -> customer, lineitem.l_{orderkey,partkey,
    suppkey} -> orders/part/supplier, events.user_id).
  - c_name / s_name embed their key (Customer#%09d) and are rebuilt
    from the offset key so name<->key consistency survives scaling.
  - events.ts shifts by i*37s per replica (avoids a 10x exact-ts
    spike while keeping the one-month window); event_id/user_id
    offset.
  - documents/embeddings replicate verbatim under offset ids: exact
    duplicate texts/vectors across replicas are the REALISTIC shape
    for dedup/ANN at scale (crawl corpora are dup-heavy), and every
    ranked query carries a total-order tiebreak so ties are
    deterministic.

Output schema is cast to the SOURCE file's physical schema (pyarrow),
so int32 columns stay int32 and the events.ts vintage (us vs ns) is
preserved exactly — Tables.events adapts to whichever vintage the
source has. Row groups are capped so Spark gets splittable files.

Usage: python3 tools/gen_sf.py [src_sf_dir] [out_dir] [R]
   eg: python3 tools/gen_sf.py /root/testdata/sf0.1 testdata-sf1 10
"""
import sys
import os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> (key columns to offset, name column rebuilt from key or None)
TABLES = {
    "region": None,          # copy once
    "nation": None,          # copy once
    "customer": (["c_custkey"], ("c_name", "Customer#")),
    "supplier": (["s_suppkey"], ("s_name", "Supplier#")),
    "part": (["p_partkey"], None),
    "orders": (["o_orderkey", "o_custkey"], None),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], None),
    "events": (["event_id", "user_id"], None),
    "documents": (["doc_id"], None),
    "embeddings": (["vec_id"], None),
}

# stride per key column = dense key-count of its OWNING table
STRIDE_OWNER = {
    "c_custkey": "customer", "o_custkey": "customer",
    "s_suppkey": "supplier", "l_suppkey": "supplier",
    "p_partkey": "part", "l_partkey": "part",
    "o_orderkey": "orders", "l_orderkey": "orders",
    "event_id": "events", "user_id": "__events_users",
    "doc_id": "documents", "vec_id": "embeddings",
}


def main():
    os.makedirs(OUT, exist_ok=True)
    src_tables = {t: pq.read_table(f"{SRC}/{t}.parquet") for t in TABLES}
    strides = {t: src_tables[t].num_rows for t in TABLES}
    users = pc.max(src_tables["events"]["user_id"]).as_py() + 1
    strides["__events_users"] = users

    for t, spec in TABLES.items():
        src = src_tables[t]
        schema = src.schema.remove_metadata()
        out_path = f"{OUT}/{t}.parquet"
        if spec is None:
            pq.write_table(src.cast(schema), out_path)
            print(f"{t}: copied {src.num_rows} rows")
            continue
        keys, name_spec = spec
        replicas = []
        for i in range(R):
            cols = {c: src[c] for c in src.column_names}
            for k in keys:
                stride = strides[STRIDE_OWNER[k]]
                cols[k] = pc.add(src[k], i * stride)
            if name_spec is not None:
                ncol, prefix = name_spec
                # rebuild "Prefix#%09d" from the offset key
                key = cols[keys[0]].combine_chunks()
                digits = pc.utf8_lpad(pc.cast(key, pa.string()), 9, "0")
                cols[ncol] = pc.binary_join_element_wise(
                    pa.array([prefix] * len(key)), digits, "")
            if t == "events" and i > 0:
                shift = pa.scalar(i * 37_000_000, pa.duration("us"))
                cols["ts"] = pc.add(src["ts"], shift)
            replicas.append(pa.table(
                {c: cols[c] for c in src.column_names}).cast(schema))
        out = pa.concat_tables(replicas)
        pq.write_table(out, out_path, row_group_size=262_144)
        print(f"{t}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
