"""Round-13 optimization profiler (guide §1): per-query diagnosis.

For each named query at $SPARK_GRAFT_SF_DIR:
  * build_s   — Python-side DataFrame construction time
  * plan_s    — analysis+optimization+physical planning (executedPlan)
  * warm_s    — first noop-sink execution (codegen + any one-time cost)
  * run_s     — second noop-sink execution (the steady-state number)
  * jobs/stages/tasks — scheduler work per steady-state run
  * shuffle_read/write bytes, executor run/cpu time (REST stage API)
  * exchanges / broadcasts / python-eval nodes counted from the plan

Diagnostic tool only — NOT the bench. Writes JSON to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def rest(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def stage_metrics(base, seen):
    """Sum metrics of completed stages not in `seen`; returns (summary, new_ids)."""
    stages = rest(f"{base}/stages?status=complete")
    new = [s for s in stages if (s["stageId"], s["attemptId"]) not in seen]
    ids = {(s["stageId"], s["attemptId"]) for s in stages}
    out = {
        "n_stages": len(new),
        "n_tasks": sum(s["numCompleteTasks"] for s in new),
        "shuffle_read_mb": round(sum(s["shuffleReadBytes"] for s in new) / 1e6, 3),
        "shuffle_write_mb": round(sum(s["shuffleWriteBytes"] for s in new) / 1e6, 3),
        "executor_run_s": round(sum(s["executorRunTime"] for s in new) / 1e3, 2),
        "executor_cpu_s": round(sum(s.get("executorCpuTime", 0) for s in new) / 1e9, 2),
    }
    return out, ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="", help="comma list; default = bench HEADLINE")
    ap.add_argument("--out", default="/tmp/profile_r13.json")
    ap.add_argument("--plans-dir", default="", help="also dump explain('formatted') per query")
    ap.add_argument("--plans-suffix", default="_before", help="plan filename suffix (_before/_after)")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_UI"] = "1"
    from irclogbot_spark.queries import queries
    from irclogbot_spark.session import get_spark
    import bench

    spark = get_spark("sparklog-profile", master=f"local[{CPUS}]")
    sc = spark.sparkContext
    app_id = sc.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"

    qs = queries()
    names = [n for n in args.queries.split(",") if n] or bench.HEADLINE
    results = {}
    seen = set()
    _, seen = stage_metrics(base, seen)

    for name in names:
        sc.setJobDescription(f"profile:{name}")
        try:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            _ = df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            # steady state run: rebuild the frame so driver-side memo
            # effects (localCheckpoint reuse inside ONE frame) behave
            # exactly like a bench pass
            _, seen = stage_metrics(base, seen)
            t35 = time.perf_counter()
            df2 = qs[name](spark, SF_DIR)
            t4 = time.perf_counter()
            df2.write.format("noop").mode("overwrite").save()
            t5 = time.perf_counter()
            met, seen = stage_metrics(base, seen)
            jobs_before = len(rest(f"{base}/jobs"))
            plan = df2._jdf.queryExecution().executedPlan().toString()
            results[name] = {
                "build_s": round(t1 - t0, 3),
                "plan_s": round(t2 - t1, 3),
                "warm_s": round(t3 - t2, 3),
                "build2_s": round(t4 - t35, 3),
                "run_s": round(t5 - t4, 3),
                "bench_s": round(t5 - t35, 3),
                **met,
                "n_exchange": plan.count("Exchange"),
                "n_broadcast": plan.count("BroadcastExchange"),
                "n_pyeval": len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)),
                "_jobs_seen": jobs_before,
            }
            if args.plans_dir:
                os.makedirs(args.plans_dir, exist_ok=True)
                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
                with open(os.path.join(args.plans_dir, f"{name}{args.plans_suffix}.txt"), "w") as f:
                    f.write(df2._jdf.queryExecution().explainString(mode))
            print(f"{name:45s} run={results[name]['run_s']:7.3f} plan={results[name]['plan_s']:6.3f} "
                  f"stages={met['n_stages']:3d} tasks={met['n_tasks']:5d} "
                  f"shW={met['shuffle_write_mb']:8.3f}MB exch={results[name]['n_exchange']}",
                  file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": repr(exc)[:300]}
            print(f"{name:45s} ERROR {exc!r}", file=sys.stderr)
        sc.setJobDescription(None)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps({"n": len(results), "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
