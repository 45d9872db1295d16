#!/usr/bin/env python3
"""Independent validation of the five semantic-dedup dumps whose DuckDB
oracles are infeasible at sf1 (round-6 verdict item 2's remaining
half): sim_embedding_neardup, sim_threshold_sweep,
sim_semantic_verdict, dedup_semdedup, dedup_semdedup_recall.

The registry oracles score every label-blocked / cell-blocked pair
with a correlated 64-term unnest sum; at sf1 (20k vectors -> ~20M
pairs x 64 terms) DuckDB stalls. This checker replays the SAME
pipeline in numpy: blocked float64 gram matrices per label block /
coarse cell, the exact augmentation (+100000 for vec_id % 20 == 0),
the exact 16-low-id centroid assignment with the (cos desc, cid)
tiebreak, union-find min-id connected components, and the SemDeDup
keep-the-least-central removal rule with its vec_id tie fall-through.

IEEE caveat, handled by MARGIN CERTIFICATION rather than bit-hope:
the engine's FloatVecDot is an ordered left-fold of exact
double(products of floats); numpy's matmul reorders the 64-term sum.
Any reordering differs by well under 1e-12 here, so every decision
the pipeline makes on a float (threshold crossings at 0.90/0.95/0.99,
nearest-centroid gaps, ca>cb removal comparisons) is checked to clear
its boundary by MARGIN (1e-9) unless the operands are bit-identical
(exact twins tie EXACTLY in both engines — same inputs, same
expression). Zero sub-margin decisions => the replay is a complete
oracle for these dumps regardless of summation order.

Usage: check_semdedup_invariants.py <verify_out_dir> [sfdir]
"""
import glob
import sys
import time

import numpy as np
import pyarrow.parquet as pq

MARGIN = 1e-9
THRESHOLDS = (0.90, 0.95, 0.99)

ok = True
submargin = 0


def fail(msg):
    global ok
    ok = False
    print(f"  FAIL: {msg}")


def report(name, cond, detail=""):
    print(f"{name}: {'PASS' if cond else 'FAIL'}{' ' + detail if detail else ''}")
    if not cond:
        global ok
        ok = False


def read_dump(out, name):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        print(f"{name}: MISSING dump at {out}/{name}")
        return None
    return pq.read_table(files[0] if len(files) == 1 else files).to_pandas() \
        if len(files) == 1 else \
        pq.ParquetDataset(f"{out}/{name}").read().to_pandas()


def margin_ok(values, boundary):
    """Count decisions within MARGIN of a float boundary (excluding
    exact equality, which both engines resolve identically only when
    the operands are bit-identical — callers handle that case)."""
    global submargin
    near = np.abs(values - boundary) < MARGIN
    n = int(np.count_nonzero(near & (values != boundary)))
    submargin += n
    return n


def pair_set(ids_a, ids_b):
    return set(zip(ids_a.tolist(), ids_b.tolist()))


def blocked_pairs(ids, emb_n, blocks, threshold):
    """All (va<vb) same-block pairs with cosine > threshold. Returns
    (pairs per block dict, counts-at-THRESHOLDS per block dict)."""
    pairs = {}
    counts = {}
    for blk in np.unique(blocks):
        sel = np.where(blocks == blk)[0]
        bi = ids[sel]
        order = np.argsort(bi, kind="stable")
        sel, bi = sel[order], bi[order]
        g = emb_n[sel] @ emb_n[sel].T
        iu, ju = np.triu_indices(len(sel), k=1)
        cos = g[iu, ju]
        for t in THRESHOLDS:
            margin_ok(cos, t)
        counts[blk] = (len(cos),) + tuple(
            int(np.count_nonzero(cos > t)) for t in THRESHOLDS)
        keep = cos > threshold
        pairs[blk] = pair_set(bi[iu[keep]], bi[ju[keep]])
    return pairs, counts


def main():
    global submargin
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"
    t0 = time.time()

    tbl = pq.read_table(f"{sfdir}/embeddings.parquet")
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    labels = np.asarray(tbl["label"], dtype=np.int64)
    emb = np.stack([np.asarray(v, dtype=np.float64)
                    for v in tbl["embedding"].to_pylist()])
    dim = emb.shape[1]
    order = np.argsort(ids, kind="stable")
    ids, labels, emb = ids[order], labels[order], emb[order]
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    print(f"corpus: {len(ids)} vectors, dim {dim}")

    # augmentation: every 20th vector duplicated at +100000
    dup = ids % 20 == 0
    aug_ids = np.concatenate([ids, ids[dup] + 100000])
    aug_labels = np.concatenate([labels, labels[dup]])
    aug_n = np.vstack([emb_n, emb_n[dup]])

    # ---- sim_embedding_neardup: label-blocked aug pairs > 0.95 ------
    pairs_by_label, _ = blocked_pairs(aug_ids, aug_n, aug_labels, 0.95)
    want = set().union(*pairs_by_label.values())
    d = read_dump(out, "sim_embedding_neardup")
    if d is not None:
        got = set(zip(d["vec_a"].tolist(), d["vec_b"].tolist()))
        report("sim_embedding_neardup", got == want,
               f"({len(got)} dump vs {len(want)} replay pairs)")

    # ---- sim_threshold_sweep: per-label counts, NON-augmented -------
    _, counts = blocked_pairs(ids, emb_n, labels, 0.95)
    d = read_dump(out, "sim_threshold_sweep")
    if d is not None:
        got = {int(r.label): (int(r.n_pairs), int(r.n_90), int(r.n_95),
                              int(r.n_99))
               for r in d.itertuples()}
        report("sim_threshold_sweep",
               got == {int(k): v for k, v in counts.items()},
               f"({len(got)} labels)")

    # ---- sim_semantic_verdict: non-aug pairs -> min-id CC -----------
    nonaug_pairs, _ = blocked_pairs(ids, emb_n, labels, 0.95)
    edges = set().union(*nonaug_pairs.values())
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id representative survives union
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    cluster = {int(v): find(int(v)) for v in ids}
    sizes = {}
    for c in cluster.values():
        sizes[c] = sizes.get(c, 0) + 1
    d = read_dump(out, "sim_semantic_verdict")
    if d is not None:
        bad = 0
        for r in d.itertuples():
            cid = cluster[int(r.vec_id)]
            if (int(r.cluster_id) != cid
                    or int(r.cluster_size) != sizes[cid]
                    or bool(r.is_kept) != (int(r.vec_id) == cid)):
                bad += 1
        report("sim_semantic_verdict",
               bad == 0 and len(d) == len(ids),
               f"({len(d)} rows, {len(sizes)} clusters, {bad} mismatches)")

    # ---- coarse assignment: 16 lowest-id centroids, aug corpus ------
    cents = emb_n[ids < 16]
    cent_ids = ids[ids < 16]
    corder = np.argsort(cent_ids, kind="stable")
    cents, cent_ids = cents[corder], cent_ids[corder]
    # Compute over UNIQUE vectors and fan the rows back out: any two
    # bit-identical vectors (the +100000 augmentation twins AND exact
    # duplicates between distinct base ids, which replicated large-sf
    # corpora contain) must get bit-identical centroid cosines, or the
    # removal rule's exact-tie fall-through (ca == cb -> vec_id order)
    # diverges from Spark's per-row scalar expression. BLAS remainder
    # kernels can split identical rows by 1 ulp across row positions.
    uniq, inv = np.unique(emb_n, axis=0, return_inverse=True)
    ccos_base = (uniq @ cents.T)[inv]            # (n, 16)
    ccos = np.vstack([ccos_base, ccos_base[dup]])  # (n_aug, 16)
    # (cos desc, cid asc) argmax with margin certification
    best = np.argmax(ccos, axis=1)               # first max -> lowest cid
    best_cos = ccos[np.arange(len(ccos)), best]
    gap = best_cos[:, None] - ccos
    gap[np.arange(len(ccos)), best] = np.inf
    near = (np.abs(gap) < MARGIN) & (gap != 0)
    submargin += int(np.count_nonzero(near.any(axis=1)))
    assigned_cid = cent_ids[best]
    assigned_cos = best_cos

    # ---- within-cell pairs + SemDeDup removal rule ------------------
    cell_pairs = {}
    removed = set()
    aorder = np.argsort(aug_ids, kind="stable")
    for cell in np.unique(assigned_cid):
        sel = aorder[assigned_cid[aorder] == cell]
        bi = aug_ids[sel]
        g = aug_n[sel] @ aug_n[sel].T
        iu, ju = np.triu_indices(len(sel), k=1)
        cos = g[iu, ju]
        margin_ok(cos, 0.95)
        keep = cos > 0.95
        va, vb = bi[iu[keep]], bi[ju[keep]]
        ca = assigned_cos[sel][iu[keep]]
        cb = assigned_cos[sel][ju[keep]]
        margin_ok(ca - cb, 0.0)
        cell_pairs[cell] = pair_set(va, vb)
        for x, y, sa, sb in zip(va.tolist(), vb.tolist(), ca, cb):
            if sa > sb:
                removed.add(x)
            elif sb > sa:
                removed.add(y)
            else:
                removed.add(max(x, y))
    caught = set().union(*cell_pairs.values()) if cell_pairs else set()

    d = read_dump(out, "dedup_semdedup")
    if d is not None:
        bad = 0
        amap = dict(zip(aug_ids.tolist(), assigned_cid.tolist()))
        for r in d.itertuples():
            if (amap.get(int(r.vec_id)) != int(r.cid)
                    or int(r.removed) != (1 if int(r.vec_id) in removed
                                          else 0)):
                bad += 1
        report("dedup_semdedup",
               bad == 0 and len(d) == len(aug_ids),
               f"({len(d)} rows, {len(removed)} removed, {bad} mismatches)")

    # ---- dedup_semdedup_recall: truth vs cell-caught per label ------
    d = read_dump(out, "dedup_semdedup_recall")
    if d is not None:
        want_rc = {}
        for lbl, p in pairs_by_label.items():
            if not p:
                continue  # zero-truth labels never reach the groupBy
            n_true = len(p)
            n_caught = len(p & caught)
            want_rc[int(lbl)] = (n_true, n_caught, n_caught * 1000 // n_true)
        got_rc = {int(r.label): (int(r.n_true), int(r.n_caught),
                                 int(r.recall_permille))
                  for r in d.itertuples()}
        report("dedup_semdedup_recall", got_rc == want_rc,
               f"({len(got_rc)} labels)")

    print(f"sub-margin float decisions: {submargin} "
          f"({'certified' if submargin == 0 else 'NOT certified'})")
    if submargin > 0:
        fail("float decisions within 1e-9 of a boundary — replay not "
             "order-independent; inspect before trusting")
    print(f"{'PASS' if ok else 'FAIL'} in {time.time() - t0:.1f}s")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
