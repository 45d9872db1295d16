#!/usr/bin/env python3
"""Head-to-head throughput: the reference implementation's own
per-document pipeline (textract_to_records + normalize_to_csv_format,
pure single-threaded Python, /root/reference/lambda_function.py) vs
graft's FarmPipeline on the SAME synthetic block corpus.

Generates a deterministic corpus (seeded per doc), writes it to
parquet for the Spark side (graft.ParityBench), and times the
reference loop. Usage:

    python3 tools/bench_parity.py [n_docs] [out_dir]
    sbt "runMain graft.ParityBench <out_dir>/blocks.parquet"
"""
import random
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/reference/lambda_function.py"
src = open(REF).read()
src = src.replace("import boto3", "boto3 = None")
src = src.replace('S3 = boto3.client("s3")', "S3 = None")
ns = {}
exec(compile(src, REF, "exec"), ns)

NAMES = ["Seymour Grady", "John A. Smith", "Mary Hall", "Robt. Stemple Jr.",
         "Wm. Jones", "A. B. Carter", "O'Brien Murphy", "Jacob van Berg"]
HEADERS = ["Wayne County West Virginia", "Agricultural Census 1860",
           "Name of Owner", "CASH VALUE of farm"]


def doc_blocks(d):
    """~50 LINE blocks over 2 pages x 2 columns, deterministic in d."""
    rng = random.Random(d)
    blocks = []

    def line(text, page, left, top):
        blocks.append({"BlockType": "LINE", "Text": text, "Page": page,
                       "Geometry": {"BoundingBox": {
                           "Left": left, "Top": top,
                           "Width": 0.1, "Height": 0.01}}})

    for page in (1, 2):
        line(rng.choice(HEADERS), page, 0.3, 0.01)
        for side, x in ((0, 0.08), (1, 0.58)):
            top = 0.05
            for i in range(10):
                name = rng.choice(NAMES)
                nums = ", ".join(str(rng.randint(1, 9999))
                                 for _ in range(rng.randint(0, 5)))
                line(f"{name}, {nums}" if nums else name, page, x, top)
                top += 0.012
                if rng.random() < 0.4:  # continuation line
                    line(", ".join(str(rng.randint(1, 999))
                                   for _ in range(rng.randint(1, 4))),
                         page, x + 0.02, top)
                    top += 0.012
                if rng.random() < 0.15:  # salvage junk
                    line(f"x {rng.randint(100, 999)} smudge", page, x, top)
                    top += 0.012
    return blocks


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/parity_bench"
    import os
    os.makedirs(out_dir, exist_ok=True)

    docs = [(f"doc{d:05d}", doc_blocks(d)) for d in range(n_docs)]
    n_blocks = sum(len(b) for _, b in docs)

    # ---- dump for the Spark side (flat columns; Scala rebuilds the
    # Geometry struct) --------------------------------------------------
    cols = {"doc": [], "seq": [], "BlockType": [], "Text": [], "Page": [],
            "Left": [], "Top": []}
    for doc, blocks in docs:
        for i, b in enumerate(blocks):
            bb = b["Geometry"]["BoundingBox"]
            cols["doc"].append(doc)
            cols["seq"].append(i)
            cols["BlockType"].append(b["BlockType"])
            cols["Text"].append(b["Text"])
            cols["Page"].append(b["Page"])
            cols["Left"].append(bb["Left"])
            cols["Top"].append(bb["Top"])
    pq.write_table(pa.table(cols), f"{out_dir}/blocks.parquet")

    # ---- time the reference (2 passes, best; warm interpreter) --------
    best = None
    rows = 0
    for _ in range(2):
        t0 = time.perf_counter()
        rows = 0
        for doc, blocks in docs:
            records = ns["textract_to_records"](blocks)
            table = ns["normalize_to_csv_format"](records)
            rows += len(table) - 1  # minus header
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"reference: {n_docs} docs / {n_blocks} blocks -> {rows} rows "
          f"in {best:.2f}s = {n_docs / best:.0f} docs/s")


if __name__ == "__main__":
    main()
