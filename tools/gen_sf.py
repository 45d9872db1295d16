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
  - documents/embeddings replicate under offset ids with a
    DETERMINISTIC PERTURBATION (round-8 — before this, replicas were
    bit-identical, which (a) collapsed every ANN top-k into a
    zero-margin exact-duplicate tie set that DuckDB's float-SUM
    oracle breaks nondeterministically, disqualifying it as referee
    for 9 sim_ ranking queries, and (b) inflated dedup candidate-pair
    mass exactly quadratically — 100x pairs for 10x data — so the
    large-SF bench measured an artifact of the generator, not a real
    10x corpus):
      * documents: replica i substitutes a salted-hash-chosen
        fraction (5% x i, capped at 45%) of whitespace tokens with
        SAME-LENGTH pseudo-words derived from splitmix64(doc_id, i,
        pos) — whitespace structure, n_chars, lang and source are all
        preserved; replica 1 is a close near-dup, replica 9 is mostly
        novel text, giving a realistic similarity spectrum instead of
        exact twins.
      * embeddings: every component of replica i gets salted
        multiplicative jitter x * (1 + 0.01u), u in [-1,1) from
        splitmix64(vec_id, i, component) — replicas stay semantic
        near-dups (cosine ~0.99998) but rank margins (~1e-5) dwarf
        both the checker's 1e-9 band and DuckDB's 1-ulp summation
        noise, so the hash oracle referees again.
    Replica 0 stays bit-identical to the source in both tables.

Output schema is cast to the SOURCE file's physical schema (pyarrow),
so int32 columns stay int32 and the events.ts vintage (us vs ns) is
preserved exactly — Tables.events adapts to whichever vintage the
source has. Row groups are capped so Spark gets splittable files.

Usage: python3 tools/gen_sf.py [src_sf_dir] [out_dir] [R]
   eg: python3 tools/gen_sf.py /root/testdata/sf0.1 testdata-sf1 10
"""
import sys
import os
import re
import numpy as np
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


_U64 = np.uint64
# uint64 wraparound IS the hash semantics — silence numpy's scalar
# overflow RuntimeWarning (array ops already wrap silently)
np.seterr(over="ignore")


def _splitmix64(x):
    """SplitMix64 finalizer over a uint64 numpy array (or scalar) —
    the counter-based deterministic hash behind every perturbation."""
    z = (x + _U64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _mix(*parts):
    """Combine uint64 arrays/scalars into one hash."""
    acc = _U64(0)
    for p in parts:
        acc = _splitmix64(acc ^ np.asarray(p, dtype=np.uint64))
    return acc


def _pseudo_word(h, n):
    """Deterministic same-length lowercase word from hash h."""
    out = []
    hh = int(h)
    for _ in range(n):
        hh = (hh * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(chr(97 + (hh >> 33) % 26))
    return "".join(out)


_TOKEN_RE = re.compile(r"\S+")


def perturb_text(text, doc_id, i):
    """Replica i>0: substitute rate=min(5%*i, 45%) of tokens with
    same-length pseudo-words (whitespace + n_chars preserved)."""
    rate = min(50 * i, 450)  # permille
    out = []
    last = 0
    for p, m in enumerate(_TOKEN_RE.finditer(text)):
        h = int(_mix(_U64(doc_id % (1 << 62)), _U64(i), _U64(p)))
        if h % 1000 < rate:
            out.append(text[last:m.start()])
            out.append(_pseudo_word(h, m.end() - m.start()))
            last = m.end()
    out.append(text[last:])
    return "".join(out)


def perturb_documents(src, i):
    """Deterministically perturbed text column for replica i (>0)."""
    ids = src["doc_id"].to_pylist()
    texts = src["text"].to_pylist()
    return pa.array(
        [perturb_text(t, d, i) for d, t in zip(ids, texts)], pa.string())


def perturb_embeddings(src, i):
    """Salted multiplicative jitter x*(1 + 0.01u) on every component
    of replica i (>0); u in [-1,1) from splitmix64(vec_id, i, j)."""
    emb = src["embedding"].combine_chunks()
    offsets = emb.offsets.to_numpy()
    flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
    lengths = np.diff(offsets)
    vec_ids = src["vec_id"].to_numpy()
    elem_vec = np.repeat(vec_ids.astype(np.uint64), lengths)
    elem_j = (np.arange(len(flat), dtype=np.uint64)
              - np.repeat(offsets[:-1].astype(np.uint64), lengths))
    h = _mix(elem_vec, np.full(len(flat), i, np.uint64), elem_j)
    u = (h.astype(np.float64) / 2.0 ** 64) * 2.0 - 1.0
    jittered = (flat * (1.0 + 0.01 * u)).astype(np.float32)
    return pa.ListArray.from_arrays(emb.offsets, pa.array(
        jittered, type=pa.float32()))


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
            if t == "documents" and i > 0:
                cols["text"] = perturb_documents(src, i)
            if t == "embeddings" and i > 0:
                cols["embedding"] = perturb_embeddings(src, i)
            replicas.append(pa.table(
                {c: cols[c] for c in src.column_names}).cast(schema))
        out = pa.concat_tables(replicas)
        pq.write_table(out, out_path, row_group_size=262_144)
        print(f"{t}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
