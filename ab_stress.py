"""Interleaved fresh-JVM A/B for the ingest-stress PLACEMENT
hypothesis (VERDICT r10 wrong #1 / next #2): the driver's round-10
ingest_stress read 142 k rows/s vs 232-248 k in the r8/r9 driver
runs and 237 k in the builder's quiet same-code run — on ingest code
that did not change. ingest_stress runs LAST in the bench JVM
(bench.py main()), after a suite that has grown to ~200 queries, so
accumulated JVM pressure (code cache, GC tenuring, broadcast/codegen
caches) is the one plausible non-environmental mechanism.

Two arms, one fresh JVM each, run ALTERNATELY (A,B x rounds) so
machine drift cancels:

  A (isolated):     fresh JVM -> one warm stress pass -> the
                    bench._ingest_stress measurement (median of 3).
  B (end-of-suite): fresh JVM -> one HEADLINE pass + one CHEAP pass
                    at sf0.1 (the suite pressure bench accumulates,
                    compressed to a single pass) -> the IDENTICAL
                    stress measurement.

If B is >= 30% below A, placement explains the driver gap and the
stress moves to its own JVM slot in bench.py (the VERDICT's
prescription); if A ~= B ~= the quiet 237 k, the driver number was
environmental co-tenancy, the round-6 rule stands.

Usage: python ab_stress.py [--rounds 3]
Prints the BENCH_AB.md rows.
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
import json, os, sys
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
arm = sys.argv[2]
import bench
from irclogbot_spark.session import get_spark
from irclogbot_spark.queries import queries

spark = get_spark("ab_stress", master="local[32]")
if arm == "suite":
    qs = queries()
    bench._run(qs, spark, bench.HEADLINE, "/root/testdata/sf0.1")
    bench._run(qs, spark, bench.CHEAP, "/root/testdata/sf0.1")
else:
    # one warm pass so arm A pays the same one-time codegen cost the
    # suite pass amortizes for arm B
    bench._ingest_stress(spark)
res = bench._ingest_stress(spark)
print("ABRESULT " + json.dumps(res))
spark.stop()
"""


def run_once(arm: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, REPO, arm],
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT ") :])
    raise RuntimeError(
        f"worker({arm}) produced no result:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    res: dict[str, list[dict]] = {"isolated": [], "suite": []}
    for r in range(args.rounds):
        for arm in ("isolated", "suite"):
            out = run_once(arm)
            res[arm].append(out)
            print(
                f"round {r + 1} {arm}: {out['rows_per_sec']} rows/s "
                f"({out['seconds']}s, minmax {out['minmax_sec']})",
                flush=True,
            )
    med = {
        arm: int(statistics.median(x["rows_per_sec"] for x in v))
        for arm, v in res.items()
    }
    ratio = med["isolated"] / med["suite"] if med["suite"] else float("inf")
    print(json.dumps({"median_rows_per_sec": med, "isolated_over_suite": round(ratio, 3)}))
    with open(os.path.join(REPO, "AB_STRESS.json"), "w") as f:
        json.dump({"rounds": res, "median": med, "ratio": round(ratio, 3)}, f, indent=1)


if __name__ == "__main__":
    main()
