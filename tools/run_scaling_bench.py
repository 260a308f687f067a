"""Two-cluster-size scaling evidence (north_rule): run the identical
benchmark workload on the identical input at local[8] and local[32] —
the sandbox stand-in for N vs 4N executors — and report docs/sec at both
plus scaling efficiency = T_8 * 8 / (T_32 * 32) ... i.e.
(throughput_32 / throughput_8) / 4.

Writes BENCH/BASELINE.md. Each run is a separate JVM (subprocess) so the
two measurements don't share executor state."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def run_once(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench failed at local[{cpus}]:\n{proc.stderr[-4000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    low_cpus = int(os.environ.get("SCALING_LOW", "8"))
    high_cpus = int(os.environ.get("SCALING_HIGH", "32"))

    low = run_once(low_cpus, sf_dir)
    high = run_once(high_cpus, sf_dir)

    ratio = high_cpus / low_cpus
    rows = []
    keys = sorted(set(low["queries"]) & set(high["queries"]))
    for k in keys:
        if k == "dedup_docs_per_sec":
            continue
        t_low, t_high = low["queries"][k], high["queries"][k]
        eff = (t_low / t_high) / ratio if t_high > 0 else float("nan")
        rows.append((k, t_low, t_high, round(t_low / max(t_high, 1e-9), 2), round(eff, 3)))

    dps_low = low["queries"]["dedup_docs_per_sec"]
    dps_high = high["queries"]["dedup_docs_per_sec"]
    dedup_eff = (dps_high / dps_low) / ratio

    out = REPO / "BENCH" / "BASELINE.md"
    out.parent.mkdir(exist_ok=True)
    lines = [
        "# BENCH/BASELINE — two-cluster-size scaling evidence",
        "",
        f"Workload: bench.py headline suite + dedup end-to-end at `{sf_dir}`",
        f"(identical input, identical code) on `local[{low_cpus}]` vs "
        f"`local[{high_cpus}]` — the sandbox stand-in for N vs {int(ratio)}N "
        "executors (driver instruction / BASELINE.md §2).",
        "",
        "## Dedup end-to-end throughput",
        "",
        "| parallelism | docs/sec | wall sec |",
        "|---|---|---|",
        f"| local[{low_cpus}] | {dps_low} | {low['queries']['dedup_end_to_end']} |",
        f"| local[{high_cpus}] | {dps_high} | {high['queries']['dedup_end_to_end']} |",
        "",
        f"**Scaling efficiency ({low_cpus}->{high_cpus} cores): "
        f"{dedup_eff:.3f}** (target >= 0.8; perfect = 1.0)",
        "",
        "## Per-query wall seconds",
        "",
        f"| query | local[{low_cpus}] s | local[{high_cpus}] s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for k, tl, th, sp, eff in rows:
        lines.append(f"| {k} | {tl} | {th} | {sp}x | {eff} |")
    lines += [
        "",
        "## Raw bench.py outputs",
        "",
        "```json",
        json.dumps(low),
        json.dumps(high),
        "```",
        "",
        "Notes: small-SF local-mode runs carry fixed JVM/Arrow overheads that",
        "a real 4x cluster-size change would not (session startup, task-launch",
        "latency on 500-5000-row tables); the dedup end-to-end number is the",
        "headline scaling figure because it is the only stage long enough to",
        "amortize them.",
    ]
    out.write_text("\n".join(lines) + "\n")
    print(json.dumps({"dedup_eff": round(dedup_eff, 3), "low": dps_low, "high": dps_high}))


if __name__ == "__main__":
    main()
