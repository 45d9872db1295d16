#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf1.json from the sharded verify_local runs.

Inputs (positional): one or more VERIFY_JSON artifacts, later files
overriding earlier ones per query (the retry run overrides the
first pass's TIMEOUT rows). Queries absent from every artifact get
the documented skip annotation below — each names the replay checker
that covers it at sf1 (all must PASS before this file is shipped).
"""
import json
import os
import sys

SKIP_NOTES = {
    # WITH RECURSIVE transitive closure: super-quadratic on the LSH
    # candidate graph (~1.7M pairs even on the perturbed vintage).
    "dedup_cc": "ORACLE-SKIPPED at sf1: closure oracle; validated by "
                "check_cc_invariants.py (fixpoint replay PASS)",
    "dedup_cluster_purity": "ORACLE-SKIPPED at sf1: closure oracle; CC "
                            "fixpoint replay covers labels",
    "dedup_cluster_sizes": "ORACLE-SKIPPED at sf1: closure oracle; CC "
                           "fixpoint replay covers labels",
    "dedup_onion": "ORACLE-SKIPPED at sf1: closure oracle; validated by "
                   "check_closure_replays.py",
    "dedup_source_impact": "ORACLE-SKIPPED at sf1: closure oracle; "
                           "validated by check_closure_replays.py",
    "dedup_stack_verdict": "ORACLE-SKIPPED at sf1: closure oracle; "
                           "validated by check_closure_replays.py",
    "dedup_verdict": "ORACLE-SKIPPED at sf1: closure oracle; validated "
                     "by check_closure_replays.py",
    "mm_dedup_verdict": "ORACLE-SKIPPED at sf1: closure oracle; "
                        "validated by check_closure_replays.py",
    # NOTE (round 9): the 12 former "OOM / spill / stall" skips
    # (gr_kcore, gr_local_clustering, gr_modularity, gr_pagerank,
    # gr_personalized_ppr, dedup_semdedup, dedup_semdedup_recall,
    # sim_embedding_neardup, sim_hubness_audit, sim_knn_graph,
    # sim_semantic_verdict, sim_threshold_sweep) were artifacts of
    # DuckDB 1.0's CTE inlining and the correlated-subquery dot
    # product, both since rewritten (AS MATERIALIZED / native list
    # functions). All 12 hash-PASS at sf1 in <5 min combined and are
    # gated like any other oracle now. Only the WITH RECURSIVE
    # transitive closures above remain structurally infeasible.
}


def main():
    if len(sys.argv) < 3:
        sys.exit("usage: assemble_sf1_correctness.py VERIFY_JSON... TARGET "
                 "(need at least one input artifact)")
    outs = sys.argv[1:-1]
    target = sys.argv[-1]
    merged = {}
    for p in outs:
        merged.update(json.load(open(p)))
    # Only annotate queries ABSENT from every artifact. A skip-listed
    # query that has a real verify row keeps it: a green row is
    # stronger evidence than the checker note, and a FAILING row must
    # surface as UNRESOLVED instead of being masked by the annotation.
    for name, note in SKIP_NOTES.items():
        if name not in merged:
            merged[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "oracle_rows": None, "err": note}
    merged = dict(sorted(merged.items()))
    # Completeness backstop: every query in the dump's oracle map must
    # have a row. A stale/partial Spark dump makes verify_local skip
    # the missing parquet dirs without writing a JSON row, and before
    # this check a CORRECTNESS file silently short of the registry
    # could ship with exit 0.
    oracle_map = os.path.join(os.path.dirname(os.path.abspath(outs[0])),
                              "oracle_sql.json")
    if os.path.isfile(oracle_map):
        expected = set(json.load(open(oracle_map)))
        missing = sorted(expected - set(merged))
        if missing:
            sys.exit(f"assemble: {len(missing)} queries have no verify row "
                     f"and no skip annotation (stale dump?): {missing}")
    else:
        print(f"WARN: {oracle_map} not found — completeness unchecked")
    unresolved = [k for k, v in merged.items()
                  if v.get("err") and not (k in SKIP_NOTES
                                           and v["err"] == SKIP_NOTES[k])]
    n_pass = sum(1 for v in merged.values() if v.get("hash_match"))
    n_note = sum(1 for k, v in merged.items()
                 if k in SKIP_NOTES and v.get("err") == SKIP_NOTES[k])
    json.dump(merged, open(target, "w"), indent=1, sort_keys=True)
    print(f"{target}: {len(merged)} rows, {n_pass} hash-pass, "
          f"{n_note} checker-annotated, "
          f"{len(unresolved)} UNRESOLVED: {unresolved}")
    sys.exit(1 if unresolved else 0)


if __name__ == "__main__":
    main()
