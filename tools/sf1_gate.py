#!/usr/bin/env python3
"""One-command sf1 correctness gate (round-9, verdict #4).

Runs the whole large-SF evidence chain that round 8 left as a manual
main-pass -> retry-timeouts -> checkers -> assemble loop, so a round
can no longer end with silently-unresolved oracle rows:

  1. Spark dump:     sbt "runMain graft.Verify <sfdir> <outdir>"
  2. Main oracle pass: verify_local.py with the structural skips
     (closure / quadratic oracles covered by checkers) and the default
     per-oracle timeout.
  3. Timeout retries: every TIMEOUT row is re-run with its named
     budget (the slow shapes are KNOWN: wedge joins, recursive
     closures, big window sorts — each gets an explicit allowance
     below) until resolved or the budget table is exhausted.
  4. Replay checkers: all six tools/check_*.py must PASS against this
     dump + sfdir — they are the evidence backing every SKIP_NOTE
     annotation, so the gate refuses to assemble without them.
  5. Assemble:        assemble_sf1_correctness.py pass1 retry*.json
                      -> CORRECTNESS_sf1.json (exit 1 on UNRESOLVED).

Exit 0  <=>  the committed artifact is shippable.

Usage: python3 tools/sf1_gate.py [sfdir] [outdir] [target_json]
  defaults: testdata-sf1  /tmp/verify_sf1  CORRECTNESS_sf1.json
  SF1_GATE_SKIP_DUMP=1 reuses an existing <outdir> Spark dump.
"""
import json
import os
import subprocess
import sys

from assemble_sf1_correctness import SKIP_NOTES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")

# Default per-oracle interrupt budget for the main pass.
DEFAULT_TIMEOUT = 450
# Known-slow oracle shapes get a named retry budget (seconds).
# Round 9 cleared the former structural slowpokes (gr_hits / sssp /
# triangle / pmi / fusion / matryoshka all run in seconds after the
# AS MATERIALIZED and native-list-dot rewrites); the remaining heavy
# shapes are the quantized-integer-dot blocked self-joins, which run
# ~4 min quiet but can exceed the 450 s default under host load.
RETRY_BUDGETS = {
    "sim_knn_graph": 1200,
    "sim_hubness_audit": 1200,
}
FALLBACK_RETRY = 900  # one retry at 2x for anything not listed

CHECKERS = [
    "check_cc_invariants.py",
    "check_closure_replays.py",
    "check_graph_invariants.py",
    "check_rank_margins.py",
    "check_semdedup_invariants.py",
    "check_sim_invariants.py",
]


def run(cmd, env=None, cwd=REPO):
    print(f"\n=== {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(cmd, env=e, cwd=cwd).returncode


def verify_pass(sfdir, outdir, json_path, only=None, timeout=DEFAULT_TIMEOUT):
    env = {
        "VERIFY_TIMEOUT": str(timeout),
        "VERIFY_MEMLIMIT": os.environ.get("VERIFY_MEMLIMIT", "48GB"),
        "VERIFY_JSON": json_path,
        "VERIFY_SKIP": ",".join(sorted(SKIP_NOTES)),
    }
    if only:
        env["VERIFY_ONLY"] = ",".join(sorted(only))
        env.pop("VERIFY_SKIP")  # ONLY already narrows the set
    run([sys.executable, os.path.join(TOOLS, "verify_local.py"),
         sfdir, outdir], env=env)
    return json.load(open(json_path))


def main():
    sfdir = os.path.abspath(
        sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "testdata-sf1"))
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
    target = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "CORRECTNESS_sf1.json")

    # 1. Spark dump (skippable when iterating on the oracle side only).
    if os.environ.get("SF1_GATE_SKIP_DUMP") != "1":
        rc = run(["sbt", f"runMain graft.Verify {sfdir} {outdir}"])
        if rc != 0:
            sys.exit(f"sf1_gate: Spark dump failed (exit {rc})")
    elif not os.path.isfile(os.path.join(outdir, "oracle_sql.json")):
        sys.exit(f"sf1_gate: SF1_GATE_SKIP_DUMP=1 but {outdir} has no dump")

    # 2. Main oracle pass.
    artifacts = [os.path.join(outdir, "gate_pass1.json")]
    results = verify_pass(sfdir, outdir, artifacts[0])

    # 3. Budgeted timeout retries (one per query; budgets are final).
    timeouts = sorted(k for k, v in results.items()
                      if v.get("err", "") and "TIMEOUT" in v["err"])
    round_no = 0
    while timeouts:
        round_no += 1
        budget = max(RETRY_BUDGETS.get(q, FALLBACK_RETRY) for q in timeouts)
        p = os.path.join(outdir, f"gate_retry{round_no}.json")
        print(f"\n### retry {round_no}: {len(timeouts)} timeout(s) "
              f"{timeouts} at budget {budget}s", flush=True)
        retry = verify_pass(sfdir, outdir, p, only=timeouts, timeout=budget)
        artifacts.append(p)
        # A query that times out at its NAMED budget is final — no loop.
        still = sorted(k for k, v in retry.items()
                       if v.get("err", "") and "TIMEOUT" in v["err"]
                       and budget < RETRY_BUDGETS.get(k, FALLBACK_RETRY))
        timeouts = still

    # 4. Replay checkers — the evidence behind every SKIP_NOTE.
    checker_fail = []
    for c in CHECKERS:
        rc = run([sys.executable, os.path.join(TOOLS, c), outdir, sfdir])
        if rc != 0:
            checker_fail.append(c)
    if checker_fail:
        sys.exit(f"sf1_gate: checker(s) FAILED: {checker_fail} — "
                 f"SKIP_NOTE annotations are unbacked, not assembling")

    # 5. Assemble (exits 1 itself on UNRESOLVED rows).
    rc = run([sys.executable,
              os.path.join(TOOLS, "assemble_sf1_correctness.py")]
             + artifacts + [target])
    sys.exit(rc)


if __name__ == "__main__":
    main()
