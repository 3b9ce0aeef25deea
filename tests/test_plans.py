"""Physical-plan regression tests: the scale-critical plan shapes
(broadcast dims, scan-level filter pushdown, no gratuitous sorts)
must not silently regress — SCALE.md's claims, asserted."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q5_dimension_joins_broadcast(spark):
    plan = _plan(spark, "tpch_q5_local_supplier")
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    assert joins, "expected joins in the plan"
    # dims (region/nation/supplier) must never shuffle the fact side
    assert "BroadcastHashJoin" in joins


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "tpch_q1_pricing_summary")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_shipdate" in l for l in pushed), pushed


def test_q3_all_three_filters_pushed(spark):
    plan = _plan(spark, "tpch_q3_shipping_priority")
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    for col in ("c_mktsegment", "o_orderdate", "l_shipdate"):
        assert col in pushed, f"{col} not pushed:\n{pushed}"


def test_topk_uses_partial_topk_not_global_sort(spark):
    plan = _plan(spark, "log_top_nicks")
    assert "TakeOrderedAndProject" in plan, "top-k should not be a full global sort"


def test_point_lookup_broadcasts_key(spark):
    plan = _plan(spark, "log_point_lookup")
    assert "BroadcastHashJoin" in plan
