"""Campaign driver interleaving the DEDUP scaling pair with a pure-JVM
CONTROL pair inside every rep (VERDICT r4 item 3: the control must share
the dedup pair's host weather, not run in its own window).

Each rep measures, back-to-back on the same cores:
    dedup local[LO] -> dedup local[HI] -> control local[LO] -> control local[HI]

so every rep yields (dedup_eff, control_eff) under the same weather. If
the control — zero Python workers, pure whole-stage-codegen compute with
one exchange — pays the same efficiency ceiling as the dedup job in a
given rep, that rep's ceiling belongs to the host, not the engine.

Prints one JSON line with both series; per-rep lines stream to stderr.
Writes BENCH/scaling_campaign2.json (the dedup series only, in the same
shape run_scaling_bench writes, mergeable by merge_scaling_campaigns.py)
plus BENCH/control_interleaved.json.

Env: SCALING_PAIRS (default "2:8"), SCALING_REPS (default 6),
SCALING_CONTROL_ROWS (default 150_000_000).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "tools"))

from run_scaling_bench import (  # noqa: E402
    _pair_eff,
    _summarize,
    ensure_corpus,
    run_control_subprocess,
    run_subprocess,
)


def main() -> None:
    ensure_corpus()
    pairs_cfg = [
        tuple(int(x) for x in p.split(":"))
        for p in os.environ.get("SCALING_PAIRS", "2:8").split(",")
        if p
    ]
    reps = int(os.environ.get("SCALING_REPS", "6"))
    n_rows = int(os.environ.get("SCALING_CONTROL_ROWS", "150000000"))
    dedup_runs: dict[tuple[int, int], list] = {p: [] for p in pairs_cfg}
    control_runs: dict[tuple[int, int], list] = {p: [] for p in pairs_cfg}
    for rep in range(reps):
        for lo_c, hi_c in pairs_cfg:
            d_lo = run_subprocess(lo_c)
            d_hi = run_subprocess(hi_c)
            c_lo = run_control_subprocess(lo_c, n_rows)
            c_hi = run_control_subprocess(hi_c, n_rows)
            dedup_runs[(lo_c, hi_c)].append((d_lo, d_hi))
            control_runs[(lo_c, hi_c)].append((c_lo, c_hi))
            print(
                json.dumps(
                    {
                        "rep": rep + 1,
                        "pair": f"{lo_c}->{hi_c}",
                        "dedup_eff": round(_pair_eff(d_lo, d_hi), 3),
                        "control_eff": round(_pair_eff(c_lo, c_hi), 3),
                        "dedup_walls": [d_lo["wall_sec"], d_hi["wall_sec"]],
                        "control_walls": [c_lo["wall_sec"], c_hi["wall_sec"]],
                    }
                ),
                file=sys.stderr,
                flush=True,
            )

    summaries = [_summarize(r) for r in dedup_runs.values()]
    camp = {
        "efficiency": summaries[0]["median_eff"],
        "estimator": "median",
        "primary_pair": [summaries[0]["low_cpus"], summaries[0]["high_cpus"]],
        "n_base": int(os.environ.get("SCALING_N_BASE", "240000")),
        "reps": reps,
        "interleaved_control": True,
        "consistent": all(s["consistent"] for s in summaries),
        "pairs": summaries,
    }
    camp_out = os.environ.get(
        "SCALING_CAMPAIGN_OUT", "BENCH/scaling_campaign2.json"
    )
    (REPO / camp_out).write_text(json.dumps(camp, indent=1))
    control_out = {
        "control": True,
        "n_rows": n_rows,
        "pairs": [
            {
                "low_cpus": p[0],
                "high_cpus": p[1],
                "median_eff": round(
                    statistics.median(_pair_eff(lo, hi) for lo, hi in r), 3
                ),
                "effs": sorted(round(_pair_eff(lo, hi), 3) for lo, hi in r),
                "reps": [
                    {
                        "low_wall": lo["wall_sec"],
                        "high_wall": hi["wall_sec"],
                        "pair_eff": round(_pair_eff(lo, hi), 3),
                    }
                    for lo, hi in r
                ],
            }
            for p, r in control_runs.items()
        ],
    }
    control_path = os.environ.get(
        "SCALING_CONTROL_OUT", "BENCH/control_interleaved.json"
    )
    (REPO / control_path).write_text(json.dumps(control_out, indent=1))
    print(json.dumps({"dedup": camp["pairs"], "control": control_out["pairs"]}))


if __name__ == "__main__":
    main()
