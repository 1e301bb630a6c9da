#!/usr/bin/env python
"""Pin the absolute per-query idle-box baseline (VERDICT r14 next-#1).

Reads a BENCH_SELF-format JSON (default: BENCH_SELF.json) and writes
BASELINE_QUERIES.json — the committed yardstick tools/round_close.py
gates every future round against ("calibrated headline <= 2x the pinned
sum"). Refuses to pin from a run that is not trustworthy as a baseline:

* the run's source fingerprint must match the live tree (same gate as
  the correctness sweep — a baseline from code that no longer exists is
  archaeology, the thing this table replaces);
* the run's mean env_factor must be ~idle (<= --max-env, default 1.15):
  pinning a loaded-box run would bake that load into every future
  comparison;
* the probe series must be stable (max/min env_factor <= 1.3): a run
  where load ARRIVED mid-bench has per-query times measured under
  different conditions than its own calibration claims.

Pinned values are CALIBRATED seconds (raw min-of-3 / env_factor), i.e.
"reference-box seconds" — comparable across boxes by construction.

Usage: python tools/pin_baseline.py [--bench FILE] [--max-env 1.15]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=os.path.join(REPO, "BENCH_SELF.json"))
    ap.add_argument("--max-env", type=float, default=1.15)
    ap.add_argument(
        "--force",
        action="store_true",
        help="pin even when an idle-run guard fails (records the waiver)",
    )
    args = ap.parse_args()

    with open(args.bench) as fh:
        rec = json.load(fh)
    from check_oracle import source_fingerprint

    live_fp = source_fingerprint()
    cal = rec.get("calibration", {})
    ef = cal.get("env_factor") or 1.0
    problems = []
    if rec.get("source_fingerprint") != live_fp:
        problems.append(
            f"bench fingerprint {rec.get('source_fingerprint')!r} != live "
            f"tree {live_fp!r}"
        )
    if ef > args.max_env:
        problems.append(f"env_factor {ef} > {args.max_env} — box not idle")
    spread = (cal.get("env_factor_max") or ef) / max(
        cal.get("env_factor_min") or ef, 1e-9
    )
    if spread > 1.3:
        problems.append(
            f"probe series unstable (max/min env_factor {spread:.2f})"
        )
    if problems and not args.force:
        for p in problems:
            print(f"PIN_BASELINE REFUSED: {p}")
        sys.exit(1)

    queries = {
        q: round(t / ef, 3) for q, t in sorted(rec["queries"].items())
    }
    out = {
        "comment": (
            "Pinned idle-box per-query baseline at sf0.1 in CALIBRATED "
            "(reference-box) seconds — min-of-3 noop-sink walls divided "
            "by the run's mean env_factor. round_close gates every "
            "round's bench at <= 2x the sum over common queries. "
            "Re-pin ONLY for intentional re-baselining (new pin must "
            "come from an idle fingerprint-fresh run)."
        ),
        "pinned_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "source_fingerprint": rec.get("source_fingerprint"),
        "env_factor": ef,
        "sf": rec.get("sf"),
        "n_queries": len(queries),
        "total_calibrated": round(sum(queries.values()), 3),
        "forced": bool(problems),
        "waived_guards": problems,
        "guards": {
            "max_env": args.max_env,
            "probe_spread": round(spread, 3),
            "probe_series": [
                p.get("env_factor") for p in cal.get("probes", [])
            ],
        },
        "queries": queries,
    }
    path = os.path.join(REPO, "BASELINE_QUERIES.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(
        f"pinned {len(queries)} queries, total {out['total_calibrated']}s "
        f"calibrated (env_factor {ef}) -> {path}"
    )


if __name__ == "__main__":
    main()
