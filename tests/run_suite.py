"""Staged CI suite runner with auto-partitioning.

Ref behavior: /root/reference/test/run_suite.py:387-468 — suites run in
stages (a preflight -> b basic -> c advanced), each stage's files greedily
partitioned across runners by estimated time; a failing earlier stage
stops later ones.

Usage:
  python tests/run_suite.py --suite a                 # one stage
  python tests/run_suite.py --suite all               # a, then b, then c
  python tests/run_suite.py --suite c \
      --auto-partition-id 0 --auto-partition-size 4   # runner shard 0/4
  python tests/run_suite.py --suite perf              # TPU throughput gate
  python tests/run_suite.py --list                    # show the plan

Partitioning is LPT (longest-processing-time greedy): files sorted by
est_time descending, each assigned to the currently-lightest runner —
the same balancing the reference's auto_partition performs.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from ci_registry import registry  # noqa: E402

STAGE_ORDER = ["a", "b", "c"]


def partition(files, est, pid: int, psize: int):
    """LPT greedy partition; returns this runner's file list."""
    buckets = [[] for _ in range(psize)]
    loads = [0.0] * psize
    for f in sorted(files, key=lambda f: -est[f]):
        i = loads.index(min(loads))
        buckets[i].append(f)
        loads[i] += est[f]
    return sorted(buckets[pid])


def stage_files(reg, stage: str):
    return [
        e.file
        for e in reg.values()
        if not isinstance(e, list) and e.stage == stage
    ]


def run_stage(stage: str, args) -> int:
    reg = registry(HERE)
    files = stage_files(reg, stage)
    if args.auto_partition_size > 1:
        est = {
            f: reg[f].est_time for f in files
        }
        files = partition(files, est, args.auto_partition_id,
                          args.auto_partition_size)
    if not files:
        print(f"[suite {stage}] nothing to run on this partition")
        return 0
    cmd = [sys.executable, "-m", "pytest", "-q"]
    if args.xdist > 1:
        cmd += ["-p", "xdist", "-n", str(args.xdist)]
    cmd += [os.path.join(HERE, f) for f in files]
    env = dict(os.environ)
    if stage == "perf":
        env["SGLANG_PERF_GATE"] = "1"
    print(f"[suite {stage}] {len(files)} files: {' '.join(files)}",
          flush=True)
    return subprocess.call(cmd, env=env, cwd=os.path.dirname(HERE))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="all",
                    choices=["a", "b", "c", "all", "perf"])
    ap.add_argument("--auto-partition-id", type=int, default=0)
    ap.add_argument("--auto-partition-size", type=int, default=1)
    ap.add_argument("--xdist", type=int,
                    default=int(os.environ.get("SUITE_XDIST", "8")))
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    reg = registry(HERE)
    strays = reg.pop("__strays__", [])
    if strays:
        print(f"WARNING: unregistered test files (auto stage c): {strays}",
              file=sys.stderr)
    if args.list:
        for stage in STAGE_ORDER + ["perf"]:
            files = stage_files(reg, stage)
            total = sum(reg[f].est_time for f in files)
            print(f"stage {stage}: {len(files)} files, est {total/60:.1f} min")
            for f in sorted(files):
                print(f"  {reg[f].est_time:7.0f}s  {f}")
        return 0

    stages = STAGE_ORDER if args.suite == "all" else [args.suite]
    for stage in stages:
        rc = run_stage(stage, args)
        if rc != 0:
            print(f"[suite {stage}] FAILED (rc={rc}); stopping pipeline",
                  file=sys.stderr)
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
