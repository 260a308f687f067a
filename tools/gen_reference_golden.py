"""Generate the differential golden corpus by querying a compiled build of
the reference library (saghen/frizbee) through a tiny stdin/stdout probe.

Usage:  python tools/gen_reference_golden.py [probe_path]

The probe (built once, outside the repo) reads one case per line and prints
the reference's match_list / match_list_indices / from_query result. Output
is cached into tests/data/reference_golden.jsonl so the differential test
runs without the Rust toolchain. Regenerate only when widening coverage.
"""

from __future__ import annotations

import json
import random
import subprocess
import sys
from pathlib import Path

US = "\x1f"
CHARSET = list(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 /.,_-:()!^'$\\"
)
UNI_CHARS = list("éنÉ다😀नαИßa bA_0/")
BOUNDARY = [1, 7, 8, 15, 16, 31, 32, 63, 64, 127, 128]


def rand_str(rng: random.Random, max_len: int, charset=CHARSET) -> str:
    if rng.random() < 0.35:
        length = rng.choice([b for b in BOUNDARY if b <= max_len] or [max_len])
    else:
        length = rng.randint(0, max_len)
    return "".join(rng.choice(charset) for _ in range(length))


def gen_cases() -> list[dict]:
    rng = random.Random(424242)
    cases = []

    def add(max_typos, casing, unicode, matching, api, needle, haystack):
        if "\n" in needle or "\n" in haystack or US in needle + haystack:
            return
        cases.append(
            dict(
                max_typos=max_typos,
                casing=casing,
                unicode=unicode,
                matching=matching,
                api=api,
                needle=needle,
                haystack=haystack,
            )
        )

    # ASCII fuzzy sweep
    for _ in range(500):
        needle = rand_str(rng, 9) or "a"
        typos = rng.choice(["none", 0, 0, 1, 2, 3])
        casing = rng.choice(["smart", "smart", "ignore", "respect"])
        hay = rand_str(rng, 120)
        add(typos, casing, "smart", "fuzzy", "list", needle, hay)
        # planted hits
        if rng.random() < 0.5:
            add(typos, casing, "smart", "fuzzy", "list", needle, needle)
            add(typos, casing, "smart", "fuzzy", "list", needle, "xx" + needle + "yy")
            add(typos, casing, "smart", "fuzzy", "list", needle, needle.swapcase())

    # greedy path (>1024 bytes)
    for _ in range(40):
        needle = rand_str(rng, 6) or "ab"
        filler = rand_str(rng, 40)
        hay = (filler * (1100 // max(1, len(filler)) + 1))[: rng.randint(1025, 1400)]
        add(rng.choice(["none", 0, 1]), "smart", "smart", "fuzzy", "list", needle, hay)
        add(1, "smart", "smart", "fuzzy", "list", needle, "x" * 1030 + needle)

    # indices API
    for _ in range(200):
        needle = rand_str(rng, 6) or "a"
        hay = rand_str(rng, 60)
        add(rng.choice([0, 1, "none"]), "smart", "smart", "fuzzy", "indices", needle, hay)
        if rng.random() < 0.5:
            add(0, "smart", "smart", "fuzzy", "indices", needle, "_" + needle + "_")

    # unicode fuzzy
    for _ in range(250):
        needle = rand_str(rng, 5, UNI_CHARS) or "é"
        hay = rand_str(rng, 40, UNI_CHARS)
        unicode = rng.choice(["smart", "always", "ignore"])
        add(
            rng.choice([0, 1, 2, "none"]),
            rng.choice(["smart", "ignore", "respect"]),
            unicode,
            "fuzzy",
            "list",
            needle,
            hay,
        )

    # unicode indices
    for _ in range(80):
        needle = rand_str(rng, 4, UNI_CHARS) or "é"
        hay = rand_str(rng, 24, UNI_CHARS)
        add(rng.choice([0, "none"]), "smart", "smart", "fuzzy", "indices", needle, hay)

    # literal modes
    for _ in range(300):
        mode = rng.choice(["exact", "prefix", "suffix", "substring"])
        charset = UNI_CHARS if rng.random() < 0.3 else CHARSET
        needle = rand_str(rng, 6, charset) or "a"
        hay = rand_str(rng, 40, charset)
        casing = rng.choice(["smart", "ignore", "respect"])
        add("none", casing, "smart", mode, "list", needle, hay)
        if rng.random() < 0.4:
            add("none", casing, "smart", mode, "list", needle, needle)
            add("none", casing, "smart", mode, "list", needle, needle + "tail")
            add("none", casing, "smart", mode, "list", needle, "head" + needle)

    # query API (multi-pattern)
    for _ in range(200):
        atoms = []
        for _ in range(rng.randint(1, 3)):
            prefix = rng.choice(["", "", "", "!", "^", "'", "!^"])
            suffix = rng.choice(["", "", "$"])
            atoms.append(prefix + (rand_str(rng, 5) or "a").strip() + suffix)
        query = " ".join(atoms)
        hay = rand_str(rng, 50)
        add(rng.choice([0, 1, "none"]), "smart", "smart", "fuzzy", "query", query, hay)

    return cases


def main() -> None:
    probe = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe/target/release/probe"
    cases = gen_cases()
    lines = []
    for c in cases:
        lines.append(
            US.join(
                [
                    str(c["max_typos"]),
                    c["casing"],
                    c["unicode"],
                    c["matching"],
                    c["api"],
                    c["needle"],
                    c["haystack"],
                ]
            )
        )
    proc = subprocess.run(
        [probe],
        input="\n".join(lines) + "\n",
        capture_output=True,
        text=True,
        check=True,
    )
    outputs = proc.stdout.splitlines()
    assert len(outputs) == len(cases), (len(outputs), len(cases))

    out_path = Path(__file__).parent.parent / "tests" / "data" / "reference_golden.jsonl"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with out_path.open("w") as f:
        for case, result in zip(cases, outputs):
            if result == "none":
                case["expected"] = None
            else:
                parts = result.split(" ")
                case["expected"] = {
                    "score": int(parts[0]),
                    "exact": parts[1] == "true",
                }
                if len(parts) > 2 and parts[2]:
                    case["expected"]["indices"] = [int(x) for x in parts[2].split(",")]
                elif case["api"] == "indices":
                    case["expected"]["indices"] = []
            f.write(json.dumps(case, ensure_ascii=False) + "\n")
    print(f"wrote {len(cases)} cases to {out_path}")


if __name__ == "__main__":
    main()
