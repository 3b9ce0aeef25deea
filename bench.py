#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query materializes fully through the 'noop' sink — a count()
would let Catalyst prune exactly the expensive columns (ids,
signatures) we mean to measure.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: The headline set: ingest chain + hash (the reference's whole job),
#: the implied analytics surface, the TPC-H-ish join/agg shapes, and
#: the north-star dedup/similarity/text operators.
HEADLINE = [
    "ingest_parse",
    "ingest_dedup",
    "log_msgs_per_channel_day",
    "log_top_nicks",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "events_sessionize",
    "events_session_window",
    "events_asof_join",
    "docs_token_stats",
    "docs_minhash_neardup",
    "docs_simhash_neardup",
    "emb_cosine_topk",
    "emb_knn_join",
]


def main() -> None:
    from irclogbot_spark.queries import queries
    from irclogbot_spark.session import get_spark

    spark = get_spark("sparklog-bench", master=f"local[{CPUS}]")
    qs = queries()
    # warm the JVM/codegen on the smallest corpus so per-query times
    # measure the operator, not first-call compilation
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
