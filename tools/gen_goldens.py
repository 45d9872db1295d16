#!/usr/bin/env python3
"""Generate golden test vectors for the parity port by running the
reference implementation (/root/reference/lambda_function.py) on a
broad, deterministic case set. The reference is loaded with its AWS
dependencies stripped (we only exercise the pure parsing functions).

Output: src/test/resources/goldens/*.json — consumed by ScalaTest.
"""
import json
import os
import random
import re

REF = "/root/reference/lambda_function.py"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "goldens")

src = open(REF).read()
src = src.replace("import boto3", "boto3 = None")
src = src.replace('S3 = boto3.client("s3")', "S3 = None")
ns = {}
exec(compile(src, REF, "exec"), ns)

rng = random.Random(42)

# ---------------------------------------------------------------- cases
NAME_WORDS = ["Seymour", "Grady", "John", "Smith", "Mary", "Hall",
              "Robt.", "Wm.", "Stemple", "A.", "B.", "J", "McDonald",
              "O'Brien", "van", "der", "Berg", "lowercase", "UPPER"]
SUFFIXES = ["Jr", "Jr.", "Sr", "sr.", "II", "iii", "IV", "v", "2nd",
            "3rd", "4th", "5th", "Esq"]
NUM_TOKENS = ["40", "1,200", "$1,200", "$1200.50", "120.5", "-", "—",
              "–", "", "0", "999999", "1234567", "12.", ".5", "1,2,3",
              "$-", "-40", "40-", "4-0", "$ 40", " 45 ", "abc", "a1",
              "1a", "x 450 smudge", "__", "_-_", "12,345", "$12,345.67",
              "٣٤", "١,٢٣", "$٣", "x٣", "٤0", "𝟒𝟎"]
HEADERS = ["Wayne County West Virginia", "Agricultural Census 1860",
           "Name of Owner", "acres of improved land",
           "CASH VALUE of farm", "The University of North Carolina",
           "pages were filmed out of sequence", "Hardy County",
           "wayne countyside", "1860", "west virginia apples",
           "some random text", "Fayette County notes"]


def rand_token():
    r = rng.random()
    if r < 0.3:
        return str(rng.randint(0, 99999))
    if r < 0.4:
        return rng.choice(["-", "—", "–"])
    if r < 0.5:
        return "$" + format(rng.randint(100, 99999), ",")
    if r < 0.8:
        return rng.choice(NAME_WORDS)
    return rng.choice(NUM_TOKENS)


def rand_line():
    r = rng.random()
    if r < 0.25:  # name line with numbers
        name = " ".join(rng.sample(NAME_WORDS, rng.randint(1, 3)))
        nums = [rand_token() for _ in range(rng.randint(0, 6))]
        return ", ".join([name] + nums)
    if r < 0.45:  # pure numeric / continuation
        return ", ".join(rand_token() for _ in range(rng.randint(1, 6)))
    if r < 0.55:  # single number
        return str(rng.randint(0, 99999))
    if r < 0.65:  # header
        return rng.choice(HEADERS)
    if r < 0.8:  # mixed junk
        return " ".join(rand_token() for _ in range(rng.randint(1, 5)))
    # name with suffix / parenthetical
    name = " ".join(rng.sample(NAME_WORDS, 2))
    if rng.random() < 0.5:
        name += " " + rng.choice(SUFFIXES)
    if rng.random() < 0.5:
        name += " (Widow Jones)"
    return name + ", " + ", ".join(rand_token() for _ in range(3))


# Unicode-whitespace cases (OCR text commonly carries NBSP   and
# thin space  ): Python str.split()/strip()/\s treat these as
# whitespace; the Scala port must agree.
UNI_WS_CASES = [
    " 40 ", " $1,200 ", "40 ", " -",
    "John Smith, 40", " Mary Hall, 5", "Smith Jones Jr.",
    "A. B. Stemple", "40, 120, -", " ",
    "  ", "800, 40, 150", "x 450 smudge",
    " Wayne County West Virginia", "Wm. Jones (Widow Jones)",
    " 42 ", "\x8545", "ab\x1ccd, 40", "1 200",
]
TOKEN_CASES = sorted(set(NUM_TOKENS + NAME_WORDS + UNI_WS_CASES +
                         [rand_token() for _ in range(300)]))
LINE_CASES = sorted(set(
    HEADERS +
    ["Seymour Grady, 25, -, -", "800, 40, 150", "John A. Smith, 40, 120, 1500, 75, 300",
     "__ - Mary Hall", "A. B. Stemple", "Robt. Smith Jr.", "Wm. Jones (Widow Jones)",
     "x 450 smudge", "450", "", " ", "-", "—", "a, 1", "1, a",
     "Mary 40, 120", "J Smith, $1,200", "Smith", "smith jones",
     "_ _ _", "40, 40, 40, 40, 40, 40, 40",
     "٣٤", "Smith, ٣٤", "٣٤, 40", "Grady, ١,٢٣, -", "x٣ smudge, 40",
     "Name, -, -, -, -, -", "O'Brien, 1,200, 45"] +
    UNI_WS_CASES +
    [rand_line() for _ in range(500)]))
NAME_CASES = sorted(set(
    ["", "Smith", "John Smith", "John Smith Jr", "John Smith jr.",
     "A. B. Stemple", "Wm. Jones (Widow Jones)", "John (alias) Smith II",
     "  spaced  out  ", "one two three four five", "X Y v",
     "Smith 2nd", "(only paren)", "Mary Hall Esq",
     "John Smith", "Mary Hall Jr", " Wm. Jones ",
     "A B Stemple"] +
    [" ".join(rng.sample(NAME_WORDS, rng.randint(1, 4))) +
     (" " + rng.choice(SUFFIXES) if rng.random() < 0.4 else "") +
     (" (Widow Jones)" if rng.random() < 0.3 else "")
     for _ in range(200)]))


def dump(name, obj):
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(obj, f, indent=0, ensure_ascii=False)
    print(name, "written")


dump("is_numeric_token.json",
     [{"in": t, "out": ns["is_numeric_token"](t)} for t in TOKEN_CASES])
dump("is_header_text.json",
     [{"in": t, "out": ns["is_header_text"](t)} for t in LINE_CASES])
dump("starts_with_name.json",
     [{"in": t, "out": ns["starts_with_name"](t)} for t in LINE_CASES])
dump("is_continuation_line.json",
     [{"in": t, "out": ns["is_continuation_line"](t)} for t in LINE_CASES])
dump("parse_structured_line.json",
     [{"in": t, "name": ns["parse_structured_line_with_positions"](t)[0],
       "numbers": ns["parse_structured_line_with_positions"](t)[1]}
      for t in LINE_CASES])
dump("extract_continuation_numbers.json",
     [{"in": t, "out": ns["extract_continuation_numbers_with_positions"](t)}
      for t in LINE_CASES])
dump("split_name.json",
     [{"in": t, "surname": ns["split_name"](t)[0],
       "given": ns["split_name"](t)[1], "suffix": ns["split_name"](t)[2],
       "alt": ns["extract_alternate_name"](t)} for t in NAME_CASES])

# merge_positional_data cases
merge_cases = []
for _ in range(300):
    base = [rng.choice(["-", str(rng.randint(0, 9999))])
            for _ in range(rng.randint(0, 6))]
    cont = [rng.choice(["-", str(rng.randint(0, 9999))])
            for _ in range(rng.randint(0, 7))]
    out = ns["merge_positional_data"](list(base), list(cont))
    merge_cases.append({"base": base, "cont": cont, "out": out})
dump("merge_positional.json", merge_cases)

# ------------------------------------------------- full-pipeline fixtures
def mkblock(text, page, left, top):
    return {"BlockType": "LINE", "Text": text, "Page": page,
            "Geometry": {"BoundingBox": {"Left": left, "Top": top,
                                         "Width": 0.1, "Height": 0.01}}}

fixtures = {}

fixtures["basic"] = [
    mkblock("Wayne County West Virginia", 1, 0.3, 0.01),
    mkblock("Name of Owner", 1, 0.1, 0.03),
    mkblock("John A. Smith, 40, 120, 1500, 75, 300", 1, 0.1, 0.10),
    mkblock("Seymour Grady, 25, -, -", 1, 0.1, 0.15),
    mkblock("800, 40, 150", 1, 0.12, 0.17),
    mkblock("Robt. Smith Jr., 10", 1, 0.1, 0.22),
    mkblock("Wm. Jones (Widow Jones), -, -, 2000", 1, 0.6, 0.10),
    mkblock("x 450 smudge", 1, 0.6, 0.12),
    mkblock("450", 1, 0.55, 0.30),   # orphan? no: after Wm Jones -> merges
]

fixtures["orphan_and_bands"] = [
    mkblock("120, 40", 1, 0.1, 0.05),          # orphan continuation (dropped)
    mkblock("Mary Hall, 5", 1, 0.1, 0.10),
    mkblock("Kate Hall, 7", 1, 0.1, 0.105),    # same band (<=0.01 gap)
    mkblock("Jane Hall, 9", 1, 0.1, 0.20),     # new band
    mkblock("A. B. Stemple, $1,200", 2, 0.2, 0.10),  # page 2
    mkblock("__ - Mary Hall, 3", 2, 0.7, 0.10),      # right col, junk prefix
]

fixtures["single_value_heuristic"] = [
    mkblock("One Comma, 500", 1, 0.1, 0.10),          # 1 comma -> slot 5
    mkblock("Four A B, 50, -, -, -", 1, 0.1, 0.15),   # >=4 commas -> slot 5
    mkblock("Big Value, -, 25000", 1, 0.1, 0.20),     # weird: two commas val>=10000 -> slot 3
    mkblock("Mid Value, -, 1500", 1, 0.1, 0.25),      # >=1000 -> slot 3
    mkblock("Small Value, -, 42", 1, 0.1, 0.30),      # <100 -> slot 5
    mkblock("Default Value, -, 500", 1, 0.1, 0.35),   # default -> slot 5
]

# randomized large fixture across 3 pages/2 columns
rand_blocks = []
for page in (1, 2, 3):
    for _ in range(40):
        rand_blocks.append(mkblock(rand_line(), page,
                                   round(rng.random(), 4),
                                   round(rng.random(), 4)))
fixtures["randomized"] = rand_blocks

golden = {}
for fname, blocks in fixtures.items():
    recs = ns["textract_to_records"](list(blocks))
    rows = ns["normalize_to_csv_format"](recs)
    golden[fname] = {"blocks": blocks, "csv_rows": rows}
dump("pipeline_fixtures.json", golden)
print("all goldens written to", os.path.abspath(OUT))

# analyze_column_structure golden vectors (dead-code histogram op)
acs_cases = []
for seed in range(40):
    r2 = random.Random(1000 + seed)
    nblocks = r2.choice([3, 8, 12, 30, 80])
    spread = r2.choice([0.05, 0.3, 0.9])
    blocks = []
    for _ in range(nblocks):
        left = round(min(0.99, r2.random() * spread + (0.5 if r2.random() < 0.5 else 0.0)), 4)
        blocks.append(mkblock(rand_line(), 1, left, round(r2.random(), 4)))
    acs_cases.append({
        "lefts": [b["Geometry"]["BoundingBox"]["Left"] for b in blocks
                  if b["Geometry"]["BoundingBox"] is not None],
        "blocks": blocks,
        "out": ns["analyze_column_structure"](blocks)})
dump("analyze_column_structure.json", acs_cases)
