"""Generate golden oracle parquet files for the non-SQL-expressible
__spark_entry__ queries at sf0.01 (the driver's correctness scale).

The match_* goldens run the SCALAR oracle path (frizbee_spark/core/matcher.py
-> core/oracle.py), which is independent of the vectorized numpy kernel the
Spark queries execute and is itself parity-tested against a compiled build of
the reference (tools/gen_reference_golden.py + tests/test_reference_differential.py).

The minhash/simhash/substring goldens are serial numpy re-executions of the
same published algorithm specs (multiply-shift MinHash, LSH banding, SimHash
sign-sum, winnowing) — stability pins rather than independent oracles; the
driver's hash check then detects any regression in the distributed path.

No Spark session is used anywhere here. Usage:
    python tools/gen_query_golden.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

from frizbee_spark.core.config import Config  # noqa: E402
from frizbee_spark.core.matcher import Matcher  # noqa: E402
from frizbee_spark.functions import hashing as H  # noqa: E402
from frizbee_spark.operators.substring_dedup import (  # noqa: E402
    _longest_common_substring_len,
    _winnow,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "tests" / "data" / "golden_sf001"


def load_documents() -> pd.DataFrame:
    import pyarrow.parquet as pq

    return (
        pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def golden_match(docs: pd.DataFrame, needle_or_query: str, config: Config,
                 query: bool = False) -> pd.DataFrame:
    matcher = Matcher.from_query(needle_or_query, config) if query else Matcher(
        needle_or_query, config
    )
    ids, scores, exacts = [], [], []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        m = matcher.match_one(text if text is not None else "", 0)
        if m is not None:
            ids.append(int(doc_id))
            scores.append(int(m.score))
            exacts.append(bool(m.exact))
    return pd.DataFrame(
        {
            "doc_id": pd.array(ids, dtype="int64"),
            "score": pd.array(scores, dtype="int32"),
            "exact": pd.array(exacts, dtype="bool"),
        }
    )


def golden_match_indices(docs: pd.DataFrame, needle: str, config: Config) -> pd.DataFrame:
    matcher = Matcher(needle, config)
    ids, scores, exacts, csvs = [], [], [], []
    sub = docs[docs["doc_id"] < 100]
    for doc_id, text in zip(sub["doc_id"], sub["text"]):
        m = matcher.match_one_indices(text if text is not None else "", 0)
        if m is not None:
            ids.append(int(doc_id))
            scores.append(int(m.score))
            exacts.append(bool(m.exact))
            csvs.append(",".join(str(i) for i in m.indices))
    return pd.DataFrame(
        {
            "doc_id": pd.array(ids, dtype="int64"),
            "score": pd.array(scores, dtype="int32"),
            "exact": pd.array(exacts, dtype="bool"),
            "indices_csv": pd.array(csvs, dtype="str"),
        }
    )


def golden_match_long(docs: pd.DataFrame, needle: str, config: Config) -> pd.DataFrame:
    """Greedy->1024B-path golden: haystacks are repeat(text, 5), pushing
    most docs past the 1024-byte banded-kernel limit so the scalar
    oracle's greedy fallback (core/oracle.py, mirroring the reference's
    >1024B arm) produces the pin the Spark kernel must match."""
    long_docs = docs.assign(
        text=[None if t is None else t * 5 for t in docs["text"]]
    )
    return golden_match(long_docs, needle, config)


_UMLAUT = str.maketrans("aeiou", "äëïöü")


def golden_match_unicode(docs: pd.DataFrame, needle: str, config: Config) -> pd.DataFrame:
    """Unicode-SW-arm golden: vowels become umlauts on BOTH the haystacks
    (translate) and the needle (callers pass a translated needle), so the
    scalar oracle's unicode scoring path — not the ASCII fast path —
    produces the pin."""
    uni_docs = docs.assign(
        text=[None if t is None else t.translate(_UMLAUT) for t in docs["text"]]
    )
    return golden_match(uni_docs, needle, config)


_STRATEGY_KEYS = {
    "score_then_index_asc": lambda r: (-r[1], r[0]),
    "score_then_index_desc": lambda r: (-r[1], -r[0]),
    "index_asc": lambda r: r[0],
    "index_desc": lambda r: -r[0],
}


def golden_sort_strategies(docs: pd.DataFrame, needle: str, config: Config) -> pd.DataFrame:
    """All four SortStrategy orderings over one match result, each row
    carrying its 1-based rank — the ordering made hash-visible as DATA
    (the driver's canonicalizer sorts rows, so bare orderings vanish)."""
    base = golden_match(docs, needle, config)
    rows = list(zip(base["doc_id"], base["score"], base["exact"]))
    frames = []
    for strategy, key in _STRATEGY_KEYS.items():
        ordered = sorted(rows, key=key)
        frames.append(
            pd.DataFrame(
                {
                    "strategy": pd.array([strategy] * len(ordered), dtype="str"),
                    "rank": pd.array(range(1, len(ordered) + 1), dtype="int32"),
                    "doc_id": pd.array([r[0] for r in ordered], dtype="int64"),
                    "score": pd.array([r[1] for r in ordered], dtype="int32"),
                    "exact": pd.array([r[2] for r in ordered], dtype="bool"),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def doc_shingles(text: str, k: int = 5) -> np.ndarray:
    data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    return np.unique(H.hash_shingles(data, k))


def golden_simhash(docs: pd.DataFrame) -> pd.DataFrame:
    vals = [
        np.int64(np.uint64(H.simhash64(doc_shingles(t))).astype(np.int64))
        for t in docs["text"]
    ]
    return pd.DataFrame(
        {
            "doc_id": pd.array(docs["doc_id"].astype("int64")),
            "simhash": pd.array(vals, dtype="int64"),
        }
    )


def golden_minhash_lsh_pairs(
    docs: pd.DataFrame, num_perm: int = 64, num_bands: int = 16, seed: int = 42,
) -> pd.DataFrame:
    # candidate_pairs emits ALL within-bucket pairs for buckets up to
    # hard_cap (salting only spreads the work); at sf0.01 no bucket can
    # exceed hard_cap=4096, so the golden is simply every >=2-member bucket
    a, b = H.minhash_params(num_perm, seed)
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        sig = H.minhash_signature(doc_shingles(text), a, b)
        bh = H.band_hashes(sig, num_bands)
        for band_id, h in enumerate(bh.astype(np.int64)):
            buckets.setdefault((band_id, int(h)), []).append(int(doc_id))
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    out = sorted(pairs)
    return pd.DataFrame(
        {
            "a": pd.array([p[0] for p in out], dtype="int64"),
            "b": pd.array([p[1] for p in out], dtype="int64"),
        }
    )


def golden_substring_dedup(
    docs: pd.DataFrame, min_len: int = 48, k: int = 24, bucket_cap: int = 64
) -> pd.DataFrame:
    w = max(1, min_len - k + 1)
    texts: dict[int, bytes] = {}
    buckets: dict[int, list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        raw = (text or "").encode("utf-8")
        texts[int(doc_id)] = raw
        fps = _winnow(np.frombuffer(raw, dtype=np.uint8), k, w)
        for fp in fps.astype(np.int64):
            buckets.setdefault(int(fp), []).append(int(doc_id))
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(set(members))
        if len(ms) < 2 or len(ms) > bucket_cap:
            continue
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    rows = []
    for a_id, b_id in sorted(cand):
        common = _longest_common_substring_len(texts[a_id], texts[b_id], k)
        if common >= min_len:
            rows.append((a_id, b_id, common))
    return pd.DataFrame(
        {
            "a": pd.array([r[0] for r in rows], dtype="int64"),
            "b": pd.array([r[1] for r in rows], dtype="int64"),
            "common_len": pd.array([r[2] for r in rows], dtype="int32"),
        }
    )


def main() -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    docs = load_documents()

    outputs = {
        "match_fuzzy": golden_match(docs, "spark join", Config(max_typos=1)),
        "match_fuzzy_no_prefilter": golden_match(
            docs, "merge sort", Config(max_typos=None)
        ),
        "match_multi_pattern": golden_match(
            docs, "spark !window", Config(max_typos=1), query=True
        ),
        "match_indices": golden_match_indices(docs, "spark join", Config(max_typos=0)),
        "match_fuzzy_long": golden_match_long(docs, "spark join", Config(max_typos=1)),
        "match_fuzzy_unicode": golden_match_unicode(
            docs, "spärk jöïn", Config(max_typos=1)
        ),
        "match_sort_strategies": golden_sort_strategies(
            docs, "spark join", Config(max_typos=1)
        ),
        "simhash_fingerprints": golden_simhash(docs),
        "minhash_lsh_pairs": golden_minhash_lsh_pairs(docs),
        "substring_dedup": golden_substring_dedup(docs),
    }
    for name, frame in outputs.items():
        path = OUT_DIR / f"{name}.parquet"
        frame.to_parquet(path, index=False)
        print(f"{name}: {len(frame)} rows -> {path}")


if __name__ == "__main__":
    main()
