#!/usr/bin/env python
"""Mechanized round close — run as the LAST step of every round, then commit.

Rounds 9 and 10 both shipped with the committed correctness sweep lagging the
registry (178/186, then 200/215): new queries were registered after the last
full sweep ran, so the committed CORRECTNESS_SELF.json no longer covered the
registry and the README's query count went stale. This script makes the close
mechanical instead of a habit:

1. full oracle sweep  -> CORRECTNESS_SELF.json  (tools/check_oracle.py)
2. bench              -> BENCH_SELF.json        (bench.py, honest noop-sink)
3. invariants         -> CORRECTNESS_SELF.n_queries == len(QUERIES)
                         and zero failures / zero missing entries
4. README             -> rewrite the "N named queries, ALL N paired" line
                         from the live registry count

Exit 0 only when every gate holds. Usage:

    python tools/round_close.py [--skip-bench] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_sweep(sf_dir: str) -> None:
    print(f"== round_close: full oracle sweep at {sf_dir} ==", flush=True)
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), sf_dir],
        cwd=REPO,
    )
    if rc != 0:
        sys.exit(f"round_close: oracle sweep FAILED (exit {rc})")


def run_bench() -> None:
    print("== round_close: bench (writes BENCH_SELF.json) ==", flush=True)
    rc = subprocess.call([sys.executable, os.path.join(REPO, "bench.py")], cwd=REPO)
    if rc != 0:
        sys.exit(f"round_close: bench FAILED (exit {rc})")


def check_perf_gate(bench_rec: dict) -> list[str]:
    """Absolute perf gate: calibrated per-query sum must stay within 2×
    of the PINNED idle-box baseline (BASELINE_QUERIES.json, written by
    tools/pin_baseline.py). Compared over the intersection so newly
    registered headline queries don't blur the yardstick; the per-query
    deltas are printed either way, converting every future perf argument
    from round-over-round archaeology into a diff (VERDICT r14 next-#1)."""
    base_path = os.path.join(REPO, "BASELINE_QUERIES.json")
    if not os.path.exists(base_path):
        print("round_close: no BASELINE_QUERIES.json — perf gate skipped")
        return []
    with open(base_path) as fh:
        base = json.load(fh)
    pinned = base.get("queries", {})
    ef = bench_rec.get("calibration", {}).get("env_factor") or 1.0
    live = bench_rec.get("queries", {})
    common = sorted(set(pinned) & set(live))
    if not common:
        return ["BASELINE_QUERIES.json shares no queries with BENCH_SELF"]
    pinned_sum = sum(pinned[q] for q in common)
    live_sum = sum(live[q] for q in common) / ef
    ratio = live_sum / pinned_sum
    print(
        f"round_close: perf vs pinned baseline — calibrated "
        f"{live_sum:.1f}s vs pinned {pinned_sum:.1f}s over "
        f"{len(common)} common queries (ratio {ratio:.2f}x)"
    )
    worst = sorted(
        common, key=lambda q: live[q] / ef - pinned[q], reverse=True
    )[:8]
    for q in worst:
        print(
            f"    {q}: {live[q] / ef:.2f}s vs pinned {pinned[q]:.2f}s "
            f"({live[q] / ef / max(pinned[q], 1e-9):.2f}x)"
        )
    if ratio > 2.0:
        return [
            f"bench calibrated sum {live_sum:.1f}s is {ratio:.2f}x the "
            f"pinned idle-box baseline {pinned_sum:.1f}s (gate: 2x)"
        ]
    return []


def check_invariants() -> int:
    import bench

    from crowdsorsa_etl_spark.queries import ORACLES, QUERIES

    with open(os.path.join(REPO, "CORRECTNESS_SELF.json")) as fh:
        self_rec = json.load(fh)
    try:
        with open(os.path.join(REPO, "BENCH_SELF.json")) as fh:
            bench_rec = json.load(fh)
    except FileNotFoundError:
        bench_rec = None
    n_reg = len(QUERIES)
    problems: list[str] = []
    # staleness gate: the sweep must have run against EXACTLY the package
    # source on disk right now — a sweep predating any later edit is
    # refused even when counts still line up (the round-13 failure mode)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from check_oracle import source_fingerprint

    swept_fp = self_rec.get("source_fingerprint")
    live_fp = source_fingerprint()
    if swept_fp != live_fp:
        problems.append(
            f"CORRECTNESS_SELF is STALE: swept source fingerprint "
            f"{swept_fp!r} != live tree {live_fp!r} — re-run the sweep "
            "against the current code (no --skip-sweep)"
        )
    if self_rec["n_queries"] != n_reg:
        problems.append(
            f"CORRECTNESS_SELF covers {self_rec['n_queries']} queries, "
            f"registry has {n_reg} — rerun the sweep after the last "
            "registration"
        )
    missing = sorted(set(QUERIES) - set(self_rec.get("queries", {})))
    if missing:
        problems.append(f"missing from committed sweep: {missing[:10]}")
    if self_rec.get("n_fail", 1) != 0:
        problems.append(f"sweep has {self_rec['n_fail']} failures")
    # bench coverage: every bench.HEADLINE entry must exist in the
    # registry AND have a recorded time in the committed BENCH_SELF
    bad_bench = sorted(set(bench.HEADLINE) - set(QUERIES))
    if bad_bench:
        problems.append(f"bench.HEADLINE names unknown queries: {bad_bench}")
    if bench_rec is not None:
        missing_bench = sorted(
            set(bench.HEADLINE) - set(bench_rec.get("queries", {}))
        )
        if missing_bench:
            problems.append(
                f"BENCH_SELF is stale — headline entries without a "
                f"recorded time: {missing_bench[:10]}"
            )
        bench_fp = bench_rec.get("source_fingerprint")
        if bench_fp is not None and bench_fp != live_fp:
            problems.append(
                "BENCH_SELF is STALE: benched source fingerprint "
                f"{bench_fp!r} != live tree — re-run bench (a later "
                "run overwrote the close artifact in place?)"
            )
        problems.extend(check_perf_gate(bench_rec))
    no_oracle = sorted(set(QUERIES) - set(ORACLES))
    if no_oracle:
        # informational: rows-only entries are allowed by the driver
        # contract, but this repo keeps every entry oracle-paired
        problems.append(f"registered without oracle: {no_oracle}")
    if problems:
        for p in problems:
            print(f"ROUND_CLOSE FAIL: {p}")
        sys.exit(1)
    print(
        f"round_close: invariants OK — {n_reg} registered == "
        f"{self_rec['n_queries']} swept, {self_rec['n_hash_match']} "
        f"hash-match, 0 fail"
    )
    return n_reg


def rewrite_survey_coverage_count() -> None:
    """Keep SURVEY.md's COVERAGE row count mechanical (VERDICT r15 #7):
    count = table body rows in COVERAGE.md (lines starting '| ' minus one
    header row per '|---' separator), written into the SURVEY sentinel
    '(N rows, one per component'. The pack-name <-> build-session
    mapping itself lives only in COVERAGE.md's top note."""
    cov_path = os.path.join(REPO, "COVERAGE.md")
    with open(cov_path) as fh:
        lines = fh.readlines()
    n_rows = sum(1 for l in lines if l.startswith("| ")) - sum(
        1 for l in lines if l.startswith("|---")
    )
    path = os.path.join(REPO, "SURVEY.md")
    with open(path) as fh:
        text = fh.read()
    new, n_subs = re.subn(
        r"\(\d+ rows, one per component",
        f"({n_rows} rows, one per component",
        text,
    )
    if n_subs == 0:
        sys.exit(
            "ROUND_CLOSE FAIL: SURVEY coverage-count sentinel "
            "('(N rows, one per component') not found"
        )
    if new != text:
        with open(path, "w") as fh:
            fh.write(new)
        print(f"round_close: SURVEY coverage row count rewritten to {n_rows}")
    else:
        print(f"round_close: SURVEY coverage row count already {n_rows}")


def rewrite_readme(n_reg: int) -> None:
    path = os.path.join(REPO, "README.md")
    with open(path) as fh:
        text = fh.read()
    new, n_subs = re.subn(
        r"\d+ named queries, ALL \d+ paired",
        f"{n_reg} named queries, ALL {n_reg} paired",
        text,
    )
    if n_subs == 0:
        sys.exit(
            "ROUND_CLOSE FAIL: README query-count sentinel "
            "('N named queries, ALL N paired') not found"
        )
    if new != text:
        with open(path, "w") as fh:
            fh.write(new)
        print(f"round_close: README query count rewritten to {n_reg}")
    else:
        print(f"round_close: README query count already {n_reg}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--skip-bench",
        action="store_true",
        help="skip the bench step (sweep + invariants + README only)",
    )
    ap.add_argument(
        "--skip-sweep",
        action="store_true",
        help="trust an already-fresh CORRECTNESS_SELF.json (invariants "
        "still verify it covers the live registry)",
    )
    args = ap.parse_args()
    if not args.skip_sweep:
        run_sweep(args.sf_dir)
    if not args.skip_bench:
        run_bench()
    n_reg = check_invariants()
    rewrite_readme(n_reg)
    rewrite_survey_coverage_count()
    print("round_close: ALL GATES GREEN — commit now")


if __name__ == "__main__":
    main()
