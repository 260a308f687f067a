"""Merge the reps of several scaling campaigns (BENCH/scaling*.json) into
one combined summary and write it as BENCH/scaling.json.

Why this exists: this host's interference arrives in multi-hour weather
windows (see BENCH/HISTORY.md round 5 — identical local[8] legs measured
55-81s across one afternoon). A single 6-rep campaign can land entirely
inside a bad window; the honest estimator of the CODE's scaling is the
median over ALL reps measured this round, across windows, with every
campaign disclosed — not the best single campaign. This tool recomputes
the same median/fastest/spread summary `run_scaling_bench._summarize`
produces, over the union of reps, and records which campaign each rep
came from.

Usage:
    python tools/merge_scaling_campaigns.py BENCH/scaling_campaign1.json \
        BENCH/scaling_campaign2.json [-o BENCH/scaling.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "tools"))

from run_scaling_bench import _summarize  # noqa: E402


def _rep_to_run_pair(rep: dict, pair: dict, n_docs: int, n_clusters: int):
    """Reconstruct the (lo, hi) worker dicts _summarize consumes from a
    recorded rep (walls are exact; docs/sec is n_docs/wall by definition)."""
    lo = {
        "cpus": pair["low_cpus"],
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "wall_sec": rep["low_wall"],
        "docs_per_sec": round(n_docs / rep["low_wall"], 2),
    }
    hi = {
        "cpus": pair["high_cpus"],
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "wall_sec": rep["high_wall"],
        "docs_per_sec": round(n_docs / rep["high_wall"], 2),
    }
    return lo, hi


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "-o"]
    out_path = REPO / "BENCH" / "scaling.json"
    if "-o" in sys.argv:
        out_path = Path(sys.argv[sys.argv.index("-o") + 1])
        args = [a for a in args if a != str(out_path)]
    campaigns = [json.loads(Path(p).read_text()) for p in args]
    assert campaigns, "pass at least one scaling.json"

    by_pair: dict[tuple[int, int], list] = {}
    provenance: dict[tuple[int, int], list] = {}
    n_base = campaigns[0]["n_base"]
    for ci, camp in enumerate(campaigns):
        assert camp["n_base"] == n_base, "campaigns must share the corpus"
        for pair in camp["pairs"]:
            key = (pair["low_cpus"], pair["high_cpus"])
            n_docs = pair["median_rep"]["low"]["n_docs"]
            n_clusters = pair["median_rep"]["low"]["n_clusters"]
            assert pair["consistent"], "refusing to merge an inconsistent campaign"
            for rep in pair["reps"]:
                by_pair.setdefault(key, []).append(
                    _rep_to_run_pair(rep, pair, n_docs, n_clusters)
                )
                provenance.setdefault(key, []).append(ci + 1)

    summaries = []
    for key, runs in by_pair.items():
        s = _summarize(runs)
        s["campaign_of_rep"] = provenance[key]
        summaries.append(s)
    primary = summaries[0]
    out = {
        "efficiency": primary["median_eff"],
        "estimator": "median",
        "primary_pair": [primary["low_cpus"], primary["high_cpus"]],
        "n_base": n_base,
        "reps": len(by_pair[(primary["low_cpus"], primary["high_cpus"])]),
        "campaigns": len(campaigns),
        "merged_from": [str(a) for a in args],
        "consistent": all(s["consistent"] for s in summaries),
        "pairs": summaries,
    }
    out_path.write_text(json.dumps(out, indent=1))
    print(json.dumps({
        "pairs": {
            f"{s['low_cpus']}->{s['high_cpus']}": {
                "median": s["median_eff"],
                "spread": [s["min_eff"], s["max_eff"]],
                "fastest_wall_pair": s["fastest_pair_eff"],
                "n_reps": len(s["reps"]),
            }
            for s in summaries
        },
        "written": str(out_path),
    }))


if __name__ == "__main__":
    main()
