"""Interleaved fresh-JVM A/B for ingest_parse (VERDICT r7 next #4):
confirm whether the 1.58 -> 2.15 s r6->r7 drift is machine noise or
a code regression in the match-gate/decomposition path.

Method = BENCH_AB.md: two checkouts (a git worktree pinned at the
round-6 HEAD vs the current HEAD) run ALTERNATELY, one fresh JVM per
(code, round) via subprocess, each doing a sf0.001 + sf0.1 warm pass
then timing 3 sf0.1 passes through the noop sink; medians compared.
Interleaving cancels machine drift; fresh JVMs remove suite-level
GC/code-cache pressure.

Usage: python ab_ingest_parse.py [--ref <commit>] [--rounds 3]
Prints the BENCH_AB.md row.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from irclogbot_spark.session import get_spark
from irclogbot_spark.queries import queries

spark = get_spark("ab_worker", master="local[32]")
qs = queries()
q = qs["ingest_parse"]
for warm_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
    q(spark, warm_dir).write.format("noop").mode("overwrite").save()
times = []
for _ in range(3):
    t0 = time.perf_counter()
    q(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)
print("ABRESULT " + json.dumps(sorted(times)))
spark.stop()
"""


def run_once(code_dir: str) -> list[float]:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, code_dir],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=code_dir,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"worker failed in {code_dir}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="f705466")  # round-6 HEAD
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--worktree", default="/tmp/ab_r6_worktree")
    args = ap.parse_args()

    if not os.path.isdir(args.worktree):
        subprocess.run(
            ["git", "worktree", "add", "--detach", args.worktree, args.ref],
            cwd=REPO,
            check=True,
        )

    ref_times: list[float] = []
    head_times: list[float] = []
    for i in range(args.rounds):
        # interleave, alternating which side goes first
        order = (
            [("ref", args.worktree), ("head", REPO)]
            if i % 2 == 0
            else [("head", REPO), ("ref", args.worktree)]
        )
        for label, d in order:
            ts = run_once(d)
            (ref_times if label == "ref" else head_times).extend(ts)
            print(f"  round {i} {label}: {[round(t, 3) for t in ts]}", flush=True)

    ref_med = statistics.median(ref_times)
    head_med = statistics.median(head_times)
    print("\n| query | r6 code (median s) | HEAD code (median s) | HEAD/r6 |")
    print("|---|---|---|---|")
    print(
        f"| ingest_parse | {ref_med:.3f} | {head_med:.3f} | "
        f"{head_med / ref_med:.2f} |"
    )
    print(
        f"spreads: r6 {min(ref_times):.3f}-{max(ref_times):.3f}, "
        f"HEAD {min(head_times):.3f}-{max(head_times):.3f}"
    )


if __name__ == "__main__":
    main()
