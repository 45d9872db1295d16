#!/usr/bin/env python3
"""Direct validation of the seven closure-family dumps whose DuckDB
WITH-RECURSIVE oracles are infeasible at sf1: dedup_verdict,
dedup_cluster_sizes, dedup_cluster_purity, dedup_source_impact,
dedup_stack_verdict, dedup_onion, mm_dedup_verdict. (dedup_cc itself
is validated by tools/check_cc_invariants.py's fixpoint replay; this
script upgrades the rest of the family from "covered transitively"
to label-for-label replayed.)

Edge-set derivation that makes this linear and self-contained:

  - The LSH candidate set is ALL distinct within-bucket pairs
    (Dedup.bandsSql / lshCandidates), and band membership is a
    PER-DOC property — so the candidate pairs of any SUBSET of the
    corpus are exactly the full-corpus candidate pairs restricted to
    both endpoints in the subset. The full-corpus pairs are the
    dedup_lsh_pairs dump, which the driver gate hash-validates
    against DuckDB directly at every sf including sf1. Raw-document
    queries (stack_verdict, source_impact, cluster_purity, onion
    stage 2) therefore restrict to ids < 100000 (the augmentation
    offsets), and onion stage 2 further restricts to exact-dedup
    survivors. No MinHash replay needed.
  - Semantic edges are label-blocked cosine > 0.95 pairs, replayed
    with blocked float64 gram matrices and margin-certified at 1e-9
    like tools/check_semdedup_invariants.py.
  - mm pHash edges: the stub pHash is 4 md5 hex nibbles of the text
    (16 bits); hamming <= 3 pairs within kind are recomputed
    exactly (DuckDB md5 + numpy popcount over all within-kind
    pairs — pigeonhole-equal to the engine's banded plan).
  - Components: iterative union-find with min-id representatives
    (the exact form Dedup.connectedComponents produces).

Usage: check_closure_replays.py <verify_out_dir> [sfdir]
"""
import glob
import sys
import time

import duckdb
import numpy as np
import pyarrow.parquet as pq

MARGIN = 1e-9
ok = True
submargin = 0


def report(name, cond, detail=""):
    global ok
    print(f"{name}: {'PASS' if cond else 'FAIL'}"
          f"{' ' + detail if detail else ''}")
    if not cond:
        ok = False


def read_dump(out, name):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        print(f"{name}: MISSING dump at {out}/{name}")
        return None
    return pq.ParquetDataset(f"{out}/{name}").read().to_pandas()


class UF:
    """Union-find with min-id representative (== engine labels)."""

    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        r = x
        while p.get(r, r) != r:
            r = p[r]
        while p.get(x, x) != x:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.p[hi] = lo


def components(pairs):
    uf = UF()
    for a, b in pairs:
        uf.union(a, b)
    lab = {}
    for v in set(x for pr in pairs for x in pr):
        lab[v] = uf.find(v)
    return lab


def verdict_rows(node_ids, lab):
    """(cluster_id, cluster_size, is_kept) per node, engine form."""
    cid = {v: lab.get(v, v) for v in node_ids}
    sizes = {}
    for c in cid.values():
        sizes[c] = sizes.get(c, 0) + 1
    return {v: (c, sizes[c], v == c) for v, c in cid.items()}


def check_verdict(dump, rows, name):
    if dump is None:
        return
    bad = 0
    for r in dump.itertuples():
        want = rows.get(int(r.doc_id))
        if (want is None or int(r.cluster_id) != want[0]
                or int(r.cluster_size) != want[1]
                or bool(r.is_kept) != want[2]):
            bad += 1
    report(name, bad == 0 and len(dump) == len(rows),
           f"({len(dump)} rows, {bad} mismatches)")


def main():
    global submargin
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"
    t0 = time.time()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sfdir}/documents.parquet')")

    # ---- shared: LSH candidate pairs (hash-validated dump) ----------
    lsh = read_dump(out, "dedup_lsh_pairs")
    if lsh is None:
        print("FAIL: dedup_lsh_pairs dump required")
        return 1
    pa_ = lsh["doc_a"].to_numpy(dtype=np.int64)
    pb_ = lsh["doc_b"].to_numpy(dtype=np.int64)
    all_pairs = list(zip(pa_.tolist(), pb_.tolist()))
    print(f"lsh candidate pairs: {len(all_pairs)}")
    doc_ids = [int(r[0]) for r in con.sql(
        "SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    aug_ids = (doc_ids
               + [d + 100000 for d in doc_ids if d % 10 == 0]
               + [d + 200000 for d in doc_ids if d % 7 == 0])

    # ---- dedup_verdict: augmented corpus + full-pair components -----
    lab_full = components(all_pairs)
    check_verdict(read_dump(out, "dedup_verdict"),
                  verdict_rows(aug_ids, lab_full), "dedup_verdict")

    # ---- dedup_cluster_sizes: histogram over pair-graph components --
    d = read_dump(out, "dedup_cluster_sizes")
    if d is not None:
        sizes = {}
        for c in lab_full.values():
            sizes[c] = sizes.get(c, 0) + 1
        hist = {}
        for sz in sizes.values():
            hist[sz] = hist.get(sz, 0) + 1
        got = {int(r.cluster_size): int(r.n_clusters) for r in d.itertuples()}
        report("dedup_cluster_sizes", got == hist, f"({len(got)} buckets)")

    # ---- raw-doc restriction of the candidate graph -----------------
    raw_mask = (pa_ < 100000) & (pb_ < 100000)
    raw_pairs = list(zip(pa_[raw_mask].tolist(), pb_[raw_mask].tolist()))
    lab_raw = components(raw_pairs)

    # ---- dedup_cluster_purity -----------------------------------------
    d = read_dump(out, "dedup_cluster_purity")
    if d is not None:
        src = dict(con.sql("SELECT doc_id, source FROM documents").fetchall())
        per = {}  # cluster -> source -> count (clustered docs only)
        for v, c in lab_raw.items():
            per.setdefault(c, {}).setdefault(src[v], 0)
            per[c][src[v]] += 1
        agg = {}  # size_bucket -> [n_clusters, sum_purity]
        for c, bysrc in per.items():
            n = sum(bysrc.values())
            if n <= 1:
                continue
            maj = max(bysrc.values())
            bucket = min(n, 4)
            a = agg.setdefault(bucket, [0, 0])
            a[0] += 1
            a[1] += maj * 1000000 // n
        want = {b: (v[0], v[1] // v[0]) for b, v in agg.items()}
        got = {int(r.size_bucket): (int(r.n_clusters), int(r.mean_purity_ppm))
               for r in d.itertuples()}
        report("dedup_cluster_purity", got == want, f"({len(got)} buckets)")

    # ---- dedup_source_impact -----------------------------------------
    d = read_dump(out, "dedup_source_impact")
    if d is not None:
        rows = con.sql(r"""SELECT doc_id, source,
            len(string_split_regex(trim(lower(text)), '\s+'))
          FROM documents""").fetchall()
        agg = {}
        for v, source, ntoks in rows:
            v = int(v)
            kept = lab_raw.get(v, v) == v
            a = agg.setdefault(source, [0, 0, 0, 0])
            a[0] += 1
            a[2] += ntoks
            if not kept:
                a[1] += 1
                a[3] += ntoks
        want = {s: (a[0], a[1], a[2], a[3], 1000 * a[1] // a[0],
                    1000 * a[3] // a[2]) for s, a in agg.items()}
        got = {r.source: (int(r.n_docs), int(r.n_dropped), int(r.tok_total),
                          int(r.tok_dropped), int(r.drop_permille),
                          int(r.tok_drop_permille)) for r in d.itertuples()}
        report("dedup_source_impact", got == want, f"({len(got)} sources)")

    # ---- semantic pairs (label-blocked cosine > 0.95), certified ----
    tbl = pq.read_table(f"{sfdir}/embeddings.parquet")
    vids = np.asarray(tbl["vec_id"], dtype=np.int64)
    vlabels = np.asarray(tbl["label"], dtype=np.int64)
    emb = np.stack([np.asarray(v, dtype=np.float64)
                    for v in tbl["embedding"].to_pylist()])
    o = np.argsort(vids, kind="stable")
    vids, vlabels, emb = vids[o], vlabels[o], emb[o]
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sem_pairs = []
    for blk in np.unique(vlabels):
        sel = np.where(vlabels == blk)[0]
        g = emb_n[sel] @ emb_n[sel].T
        iu, ju = np.triu_indices(len(sel), k=1)
        cos = g[iu, ju]
        near = np.abs(cos - 0.95) < MARGIN
        submargin += int(np.count_nonzero(near & (cos != 0.95)))
        keep = cos > 0.95
        bi = vids[sel]
        sem_pairs += list(zip(bi[iu[keep]].tolist(), bi[ju[keep]].tolist()))
    print(f"semantic pairs: {len(sem_pairs)}")

    # ---- dedup_stack_verdict: raw lexical + semantic edges ----------
    lab_stack = components(raw_pairs + sem_pairs)
    check_verdict(read_dump(out, "dedup_stack_verdict"),
                  verdict_rows(doc_ids, lab_stack), "dedup_stack_verdict")

    # ---- dedup_onion: staged exact -> lexical -> semantic -----------
    d = read_dump(out, "dedup_onion")
    if d is not None:
        canon = dict(con.sql("""SELECT doc_id,
            MIN(doc_id) OVER (PARTITION BY md5(text)) FROM documents""")
            .fetchall())
        drop_exact = {int(v) for v, c in canon.items() if v != c}
        s1 = set(doc_ids) - drop_exact
        lab2 = components([(a, b) for a, b in raw_pairs
                           if a in s1 and b in s1])
        drop_lex = {v for v, c in lab2.items() if v != c}
        s2 = s1 - drop_lex
        lab3 = components([(a, b) for a, b in sem_pairs
                           if a in s2 and b in s2])
        drop_sem = {v for v, c in lab3.items() if v != c}
        bad = 0
        for r in d.itertuples():
            v = int(r.doc_id)
            want = ("exact" if v in drop_exact
                    else "lexical" if v in drop_lex
                    else "semantic" if v in drop_sem
                    else "kept")
            if r.drop_stage != want:
                bad += 1
        report("dedup_onion", bad == 0 and len(d) == len(doc_ids),
               f"({len(d)} rows, {len(drop_exact)}/{len(drop_lex)}/"
               f"{len(drop_sem)} dropped per stage, {bad} mismatches)")

    # ---- mm_dedup_verdict: stub-pHash hamming <= 3 within kind ------
    d = read_dump(out, "mm_dedup_verdict")
    if d is not None:
        rows = con.sql("""SELECT doc_id,
            (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 4096 +
            (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 256 +
            (strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16 +
            (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1)
          FROM documents ORDER BY doc_id""").fetchall()
        pid = np.array([int(r[0]) for r in rows], dtype=np.int64)
        ph = np.array([int(r[1]) for r in rows], dtype=np.uint16)
        pop = np.array([bin(x).count("1") for x in range(65536)],
                       dtype=np.uint8)
        mm_pairs = []
        for k in range(3):
            sel = pid % 3 == k
            ki, kp = pid[sel], ph[sel]
            for s0 in range(0, len(ki), 2048):
                chunk = kp[s0:s0 + 2048]
                ham = pop[np.bitwise_xor(chunk[:, None], kp[None, :])]
                ii, jj = np.nonzero(ham <= 3)
                gi = ii + s0
                keep = gi < jj
                mm_pairs += list(zip(ki[gi[keep]].tolist(),
                                     ki[jj[keep]].tolist()))
        print(f"phash pairs (hamming<=3): {len(mm_pairs)}")
        lab_mm = components(mm_pairs)
        rows_mm = verdict_rows(doc_ids, lab_mm)
        kinds = ("image", "audio", "video")
        bad = 0
        for r in d.itertuples():
            v = int(r.doc_id)
            want = rows_mm.get(v)
            if (want is None or r.kind != kinds[v % 3]
                    or int(r.cluster_id) != want[0]
                    or int(r.cluster_size) != want[1]
                    or bool(r.is_kept) != want[2]):
                bad += 1
        report("mm_dedup_verdict", bad == 0 and len(d) == len(doc_ids),
               f"({len(d)} rows, {bad} mismatches)")

    print(f"sub-margin float decisions: {submargin} "
          f"({'certified' if submargin == 0 else 'NOT certified'})")
    if submargin > 0:
        report("margin-certification", False)
    print(f"{'PASS' if ok else 'FAIL'} in {time.time() - t0:.1f}s")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
