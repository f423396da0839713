#!/usr/bin/env python3
"""Determinism shaker: the local gate that catches order-sensitive cells.

Usage: python3 tools/verify_shake.py <sf_dir> [query ...]

Runs graft.Verify at several SPARK_GRAFT_CPUS settings and compares each
run against the DuckDB oracle with tools/verify_local.py. Different
core/shuffle-partition counts schedule different partial-aggregation
merge orders, so a floating aggregate whose rounded value sits on a
decision boundary (round 6's q_ch_convert red) flips in at least one
setting HERE, before the driver's single-shot run can see it.

Every declared oracle must pass at every setting; exit 1 otherwise.
"""
import os
import shutil
import subprocess
import sys

CPUS = ["3", "13", "32"]


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    sf_dir = sys.argv[1]
    queries = sys.argv[2:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bad = []
    for c in CPUS:
        out = f"/tmp/graft_shake_{c}"
        # a subset run writes only its queries' dirs; stale results from
        # an earlier full run would then be compared against the fresh
        # oracle json and report phantom failures — always start clean
        shutil.rmtree(out, ignore_errors=True)
        print(f"=== SPARK_GRAFT_CPUS={c} -> {out}", flush=True)
        run_args = " ".join(["graft.Verify", sf_dir, out] + queries)
        r = subprocess.run(
            ["sbt", "-batch", f"runMain {run_args}"],
            cwd=repo, env=dict(os.environ, SPARK_GRAFT_CPUS=c),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if r.returncode != 0:
            print(f"  Verify main FAILED at cpus={c}")
            bad.append(c)
            continue
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "verify_local.py"),
             out, sf_dir] + queries)
        if r.returncode != 0:
            bad.append(c)
    if bad:
        print(f"SHAKE FAIL at cpus={bad}")
        sys.exit(1)
    print(f"SHAKE PASS at cpus={CPUS}")


if __name__ == "__main__":
    main()
