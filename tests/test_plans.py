"""Physical-plan regression tests: the scale-critical plan shapes
(broadcast dims, scan-level filter pushdown, no gratuitous sorts)
must not silently regress — SCALE.md's claims, asserted."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

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


def test_lm_score_vocab_broadcast_and_topk(spark):
    """docs_lm_score: the vocabulary must reach the scoring join as a
    broadcast (the corpus is never shuffled to be scored) and the
    top-K vocab cut must compile to TakeOrderedAndProject, not a
    global sort."""
    plan = _plan(spark, "docs_lm_score")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_repetition_partial_agg_before_exchange(spark):
    """docs_quality (merged repetition battery): the (doc, n, gram)
    count must partially aggregate map-side before its exchange —
    the repeated grams the operator detects are exactly what the
    partial agg collapses — and the per-doc signal side must reach
    the quality projection as a broadcast, not a shuffle join."""
    plan = _plan(spark, "docs_quality")
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_single_shuffle(spark):
    """docs_pack_sequences: exactly one hash exchange (the shard
    partition) feeding one window sort — no second data shuffle (the
    round-robin ensure_parallelism exchange is not a keyed shuffle)."""
    plan = _plan(spark, "docs_pack_sequences")
    assert len(re.findall(r"Arguments: hashpartitioning", plan)) == 1
    assert "Window" in plan


def test_pii_redact_map_only(spark):
    """docs_pii_redact: pure projection — no exchange, no aggregate,
    no join anywhere in the plan."""
    plan = _plan(spark, "docs_pii_redact")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_c4_clean_map_only(spark):
    """docs_c4_clean: one map-only projection — no exchange anywhere
    (the scan is a single stage; cleaning adds no boundary)."""
    plan = _plan(spark, "docs_c4_clean")
    assert "Exchange" not in plan, plan


def test_inverted_index_one_data_shuffle_with_partial_agg(spark):
    """docs_inverted_index: exactly one hash exchange on term, with
    partial aggregation before it, and top-k via
    TakeOrderedAndProject (never a global sort)."""
    plan = _plan(spark, "docs_inverted_index")
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert len(hashex) == 1, hashex
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_incremental_dedup_no_cartesian(spark):
    """docs_incremental_dedup: every join is keyed — no cartesian /
    broadcast nested loop anywhere in the two-layer pipeline."""
    plan = _plan(spark, "docs_incremental_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_budget_cap_single_window_shuffle(spark):
    """docs_budget_cap: the only hash exchange is the window's
    partition on source."""
    plan = _plan(spark, "docs_budget_cap")
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert len(hashex) == 1, hashex
    assert "source" in hashex[0]


def test_semantic_dedup_no_cartesian(spark):
    """emb_semantic_dedup: the within-cell pair join is keyed on the
    cell id (hash join with the rank inequality as residual) — no
    cartesian / broadcast nested loop."""
    plan = _plan(spark, "emb_semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_score_map_only(spark):
    """docs_quality_score: the whole classifier is one projection over
    the scan — no exchange, no join, no aggregate anywhere."""
    plan = _plan(spark, "docs_quality_score")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan


def test_chunking_map_only(spark):
    """docs_chunking: tokenize -> explode -> slice is a map-only
    pipeline over the scan — no key shuffle, no join; the only
    allowed exchange is ensure_parallelism's round-robin split guard
    (a no-op on well-split cluster inputs)."""
    plan = _plan(spark, "docs_chunking")
    assert "hashpartitioning" not in plan, plan
    assert "Join" not in plan
    assert "Sort" not in plan


def test_tfidf_topk_no_forced_unbounded_broadcast(spark):
    """docs_tfidf_topk: the df-table join must NOT be a FORCED
    broadcast — its cardinality is the corpus's distinct-term count,
    unbounded at scale (a hinted broadcast there is a driver OOM at
    100 TB, regardless of what stats say at test SF). The only
    allowed hint is the 1-row corpus count; whether the df join
    broadcasts is left to Catalyst/AQE size estimates (which DO
    choose broadcast at this SF — correctly — and choose a shuffled
    term join when the table is big). Every hash exchange carries
    only term- or id-keyed triples, never text."""
    df = entrymod.queries()["docs_tfidf_topk"](spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1, analyzed
    plan = _plan(spark, "docs_tfidf_topk")
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row corpus count
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert all(("term" in l) or ("doc_id" in l) for l in hashex), hashex
    for line in plan.splitlines():
        if "Exchange" in line and "Arguments" in line:
            assert "text" not in line, line


def test_pq_topk_adc_broadcast_and_partial_topk(spark):
    """emb_pq_topk: the ADC scan is a broadcast nested-loop of the
    (tiny) query+lut side against the code column — the corpus never
    shuffles for it; the rerank vector fetch is a BroadcastHashJoin
    on id; both per-query top-k windows run WindowGroupLimit (partial
    top-k before the exchange); the only hash exchanges are the two
    query-keyed window shuffles."""
    plan = _plan(spark, "emb_pq_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "WindowGroupLimit" in plan
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert len(hashex) == 2, hashex


def test_ivfpq_topk_bucket_join_no_corpus_shuffle_for_probe(spark):
    """emb_ivfpq_topk: probed query cells broadcast into the code
    table (BroadcastHashJoin on cell — at rest this is partition
    pruning), rerank vectors fetched by broadcast id join, partial
    top-k windows, and no sort-merge anywhere."""
    plan = _plan(spark, "emb_ivfpq_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "WindowGroupLimit" in plan
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert len(hashex) == 2, hashex


def test_vocab_coverage_partial_topk_one_term_shuffle(spark):
    """docs_vocab_coverage: the top-max_terms cut must be a partial
    top-k (TakeOrderedAndProject — never a global sort of the
    vocabulary), term counts partially aggregated before their one
    exchange, and the corpus-total joined as a broadcast."""
    plan = _plan(spark, "docs_vocab_coverage")
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan or "partial" in plan.lower(), plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    # term-count exchange (+ its reuse); no corpus-keyed shuffles
    assert all("term" in l for l in hashex), hashex


def test_retention_broadcast_denominator_no_sort_merge(spark):
    """events_retention: the per-cohort sizes join must broadcast
    (the denominator table is weeks-sized) — the activity side is
    never re-shuffled on cohort_week."""
    plan = _plan(spark, "events_retention")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_tokenize_broadcast_vocab_no_text_shuffle(spark):
    """docs_tokenize: the vocabulary lookup must be a broadcast hash
    join (the corpus is never shuffled to be encoded) and no exchange
    may carry the text column — only (id, pos, tid) triples move."""
    plan = _plan(spark, "docs_tokenize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line and "Arguments" in line:
            assert "text" not in line, line


def test_funnel_window_same_single_user_exchange(spark):
    """events_funnel_window: the conversion-window bound is two extra
    comparisons inside the window-min conditions — the plan keeps
    exactly ONE user-key hash exchange, like the unconstrained
    funnel."""
    plan = _plan(spark, "events_funnel_window")
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_winnow_query_no_text_in_exchanges(spark):
    """docs_winnow_fingerprint: fingerprint extraction is in-row —
    every hash exchange carries only fp/doc-id/pair columns, never
    document text; the pair stage is co-partitioned on fp (no
    sort-merge of corpus-sized sides, no nested loop)."""
    plan = _plan(spark, "docs_winnow_fingerprint")
    for line in plan.splitlines():
        if "Exchange" in line and "Arguments" in line:
            assert "text" not in line, line
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_importance_query_map_only_scoring(spark):
    """docs_importance_resample: scoring is a projection over the
    scan (plan-constant weight table — no join, no exchange);
    selection is a partial top-k."""
    plan = _plan(spark, "docs_importance_resample")
    assert "Join" not in plan, plan
    assert "hashpartitioning" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_paragraph_dedup_no_text_in_exchanges(spark):
    """docs_paragraph_dedup: paragraphs split and hash IN-ROW; the
    doc-frequency count and dup-position collect move only
    (doc_id, pos, hash) triples, and the rebuild is an in-row filter
    — no exchange may carry the text column or the paragraph array.
    The dup-hash set join is NOT a forced broadcast (unbounded
    boilerplate cardinality — the tfidf lesson); no nested loop."""
    plan = _plan(spark, "docs_paragraph_dedup")
    for line in plan.splitlines():
        if "Exchange" in line and "Arguments" in line:
            assert "text" not in line, line
            assert "_paras" not in line, line
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_decontam_bloom_probe_map_only(spark):
    """docs_decontam_bloom: the returned plan is the PROBE — the
    filter is a plan-constant literal, so the train scan must carry
    no join and no data shuffle (shingle, positions, bit tests all
    in-row). The filter build runs as its own tiny job at plan time;
    the corpus never hash-partitions. The one allowed exchange is
    ensure_parallelism's round-robin fan-out of the single-file local
    scan (a no-op on a many-file cluster read)."""
    plan = _plan(spark, "docs_decontam_bloom")
    assert "Join" not in plan, plan
    assert "hashpartitioning" not in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line and "Arguments" in line:
            assert "RoundRobinPartitioning" in line, line


def test_top_paths_single_user_exchange_partial_topk(spark):
    """events_top_paths: both lead() passes share ONE user-key
    exchange; the count partial-aggregates and the top-k is a
    TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "events_top_paths")
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_semantic_decontam_no_corpus_shuffle(spark):
    """emb_semantic_decontam: the eval pack is ONE broadcast row and
    the max-similarity is computed in-row — the corpus never
    hash-partitions and no sort-merge join appears."""
    plan = _plan(spark, "emb_semantic_decontam")
    assert "hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_tokenize_fast_map_only(spark):
    """docs_tokenize_fast: the vocab is a plan-constant map literal —
    the encode is a pure projection over the scan. No join, no
    exchange of any kind."""
    plan = _plan(spark, "docs_tokenize_fast")
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_events_anomaly_broadcast_stats_two_narrow_shuffles(spark):
    """events_anomaly: the per-type stat table broadcasts back (types
    are bounded) — no sort-merge join; shuffles carry only
    (type, centi-value) pairs and partial-agg states."""
    plan = _plan(spark, "events_anomaly")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_corpus_shuffle_single_shard_exchange(spark):
    """docs_corpus_shuffle: ONE hash exchange (the shard key for the
    rank window) — the hash/shard/pos derivation is all map-side, and
    there is no global sort."""
    plan = _plan(spark, "docs_corpus_shuffle")
    # formatted mode splits the node name and its Arguments line
    assert len(re.findall(r"Arguments: hashpartitioning\(shard", plan)) == 1, plan
    assert "rangepartitioning" not in plan, plan


def test_media_audio_stats_map_only(spark):
    """media_audio_stats: synth -> WAV decode -> stats is a pure
    map pipeline — media bytes never ride a shuffle."""
    plan = _plan(spark, "media_audio_stats")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_q4_semi_join_pushed_window_no_nested_loop(spark):
    """tpch_q4: the EXISTS compiles to a LeftSemi HASH join (the
    interval clause is a residual condition, never a nested loop);
    the 1-year order window is pushed to the orders scan."""
    plan = _plan(spark, "tpch_q4_order_priority")
    assert "LeftSemi" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThanOrEqual(o_orderdate" in pushed, pushed


def test_q7_nation_pair_disjunction_pushed_dims_broadcast(spark):
    """tpch_q7: Catalyst infers per-side nation-name IN-lists from
    the disjunctive pair filter and pushes them into BOTH nation
    scans; every dim join broadcasts; the shipdate range reaches the
    lineitem scan."""
    plan = _plan(spark, "tpch_q7_volume_shipping")
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "EqualTo(n_name,NATION_1)" in pushed, pushed
    assert "GreaterThanOrEqual(l_shipdate" in pushed, pushed
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan, plan


def test_q13_outer_join_priority_filter_pushed(spark):
    """tpch_q13: the LEFT OUTER survives to the physical plan (zero
    bucket preserved) and the priority exclusion is pushed to the
    orders scan, not applied post-join (which would corrupt outer
    semantics)."""
    plan = _plan(spark, "tpch_q13_cust_distribution")
    assert "LeftOuter" in plan, plan
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in pushed, pushed


def test_q17_brand_filter_pushed_before_stats(spark):
    """tpch_q17: the brand filter reaches the part scan (stats are
    computed over filtered parts only — the join order that makes
    the decorrelated subquery cheap), and the correlated-average
    decorrelation never degenerates to a nested loop."""
    plan = _plan(spark, "tpch_q17_small_qty_revenue")
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "EqualTo(p_brand,Brand#1)" in pushed, pushed
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q22_anti_join_hash_scalar_fold_only_bnlj(spark):
    """tpch_q22: the lapsed-customer NOT EXISTS is a LeftAnti HASH
    join; the only nested-loop node is the sanctioned 1-row scalar
    fold (positive-balance average); both scan filters are
    pushed."""
    plan = _plan(spark, "tpch_q22_global_sales")
    assert "LeftAnti" in plan, plan
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThan(c_acctbal,0.0)" in pushed, pushed
    assert "GreaterThanOrEqual(o_orderdate,1999-01-01" in pushed, pushed


def test_q6_all_predicates_pushed_two_column_scan(spark):
    """tpch_q6: the canonical pushdown probe — shipdate range,
    discount band, and quantity cap ALL land in PushedFilters, and
    the scan reads only the columns the sum needs (no full-row
    read for a 2-measure aggregate)."""
    plan = _plan(spark, "tpch_q6_forecast_revenue")
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThanOrEqual(l_shipdate" in pushed, pushed
    assert "GreaterThanOrEqual(l_discount,0.05)" in pushed, pushed
    assert "LessThan(l_quantity,24.0)" in pushed, pushed
    schema = "\n".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_partkey" not in schema, schema
    assert "Exchange hashpartitioning" not in plan, plan


def test_q19_disjunction_stays_hash_join(spark):
    """tpch_q19: the OR-of-ANDs predicate does NOT break the
    p_partkey equi join — Catalyst keeps a BroadcastHashJoin and
    evaluates the disjunction as a residual, never a nested loop
    over lineitem x part."""
    plan = _plan(spark, "tpch_q19_disjunctive_rev")
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q21_aggregation_rewrite_single_orderkey_shuffle(spark):
    """tpch_q21: the multi-EXISTS rewrite aggregates lineitem ONCE
    per order — no self-joins of lineitem against itself (the
    literal EXISTS form would shuffle it three times), and the
    orderstatus filter reaches the orders scan."""
    plan = _plan(spark, "tpch_q21_waiting_suppliers")
    # formatted explain lists each scan twice (tree + detail):
    # 3 scans (lineitem, orders, supplier) = 6 mentions; the literal
    # EXISTS form would need 3 lineitem scans -> 10 mentions
    assert plan.count("Scan parquet") <= 6, plan
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "EqualTo(o_orderstatus,F)" in pushed, pushed
    assert "CartesianProduct" not in plan, plan


def test_q15_max_fold_is_only_nested_loop(spark):
    """tpch_q15: the scalar MAX subquery decorrelates to a 1-row
    broadcast fold (the sanctioned bounded BNLJ); the supplier join
    broadcasts; revenue aggregates shuffle on l_suppkey only."""
    plan = _plan(spark, "tpch_q15_top_supplier")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_salted_enrich_shuffles_on_composite_salt_key(spark):
    """events_salted_enrich: the join's keys are the (key, __salt)
    COMPOSITE — the whole point; a hot key's rows hash to
    salt_buckets different partitions/build slots. (At this SF the
    salted build side broadcasts; on a big dim the same composite
    becomes the shuffle key — either way the key list carries the
    salt.) No nested loop from the build-side salt explode."""
    plan = _plan(spark, "events_salted_enrich")
    keys = [
        l for l in plan.splitlines()
        if ("keys" in l or "hashpartitioning" in l) and "__salt" in l
    ]
    assert keys, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_editdist_no_text_in_gram_exchanges_no_nested_loop(spark):
    """docs_editdist_neardup: gram extraction is in-row — the gram /
    pair / count-filter exchanges carry ids, grams and counts, never
    document text; candidates bound every join (no nested loop, no
    cartesian)."""
    plan = _plan(spark, "docs_editdist_neardup")
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line and "Arguments" in line:
            assert "text" not in line, line
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_snapshot_diff_full_outer_no_text_in_exchanges(spark):
    """docs_snapshot_diff: the FULL OUTER survives to the physical
    plan (added AND removed rows both preserved) and only (id, fp)
    pairs ride its exchanges."""
    plan = _plan(spark, "docs_snapshot_diff")
    assert "FullOuter" in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line and "Arguments" in line:
            assert "text" not in line, line


def test_winsorize_stats_broadcast_back(spark):
    """docs_length_winsorize: the 20-row percentile table broadcasts
    back onto the corpus — the clamp pass never shuffles the corpus
    a second time."""
    plan = _plan(spark, "docs_length_winsorize")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_zorder_key_matches_python_interleave(spark):
    from irclogbot_spark.plans.partitioning import zorder_key

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), bits=4).alias("z")
        ).collect()
    }

    def ref(x, y):
        z = 0
        for b in range(4):
            z |= ((x >> b) & 1) << (2 * b + 1)
            z |= ((y >> b) & 1) << (2 * b)
        return z

    assert got == {(x, y): ref(x, y) for x, y in rows}


def test_zorder_sort_localizes_both_dimensions(spark):
    """Sorted by zkey, any 64-key-aligned block spans at most an
    8x8 tile in (x, y) — the data-skipping property: min/max stats
    of a block bound BOTH dimensions."""
    from irclogbot_spark.plans.partitioning import zorder_key

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")
    )
    blocks = (
        df.groupBy((F.col("z") / 64).cast("long").alias("blk"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert all(r.sx <= 7 and r.sy <= 7 for r in blocks)


def test_priority_sample_global_topk_is_heap_not_sort(spark):
    """docs_priority_sample: the k+1 selection must compile to
    TakeOrderedAndProject (per-partition heap + driver merge), never
    a global sort exchange over the corpus."""
    plan = _plan(spark, "docs_priority_sample")
    assert "TakeOrderedAndProject" in plan


def test_unigram_dp_is_pure_catalyst_no_python(spark):
    """docs_unigram_segment: the Viterbi fold must stay JVM-side —
    no Python evaluation node of any kind in the plan."""
    plan = _plan(spark, "docs_unigram_segment")
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, f"{node} leaked into the DP plan"


def test_backoff_surprisal_scores_without_joins(spark):
    """docs_backoff_surprisal: both cost tables ride the plan as map
    literals — scoring must contain NO join node at all (the whole
    query is scan -> explode -> project -> partial agg)."""
    plan = _plan(spark, "docs_backoff_surprisal")
    assert not re.search(r"Join", plan), "cost lookup must not be a join"


def test_zorder_key_is_map_only(spark):
    """events_zorder_layout: pure bit arithmetic — no Exchange in the
    whole plan."""
    plan = _plan(spark, "events_zorder_layout")
    assert "Exchange" not in plan


def test_prefix_filter_never_nested_loop(spark):
    """docs_prefix_filter_join: candidate generation + verification
    must stay hash-based — no cartesian/nested-loop node even though
    the oracle is the quadratic all-pairs form."""
    plan = _plan(spark, "docs_prefix_filter_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_html_extract_map_only_no_exchange(spark):
    """docs_html_extract: the wrap + strip chain is ONE codegen'd
    projection over the scan — no Exchange, no UDF, no Python stage
    (SCALE: markup extraction at 100 TB is embarrassingly parallel
    and must stay that way)."""
    plan = _plan(spark, "docs_html_extract")
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan
    # '*' prefix = inside a WholeStageCodegen span in formatted mode
    assert "* Project" in plan, plan


def test_nfc_normalize_no_shuffle_arrow_stage(spark):
    """docs_nfc_normalize: the unicodedata seam is an Arrow-batched
    Python eval inside a map-only plan — no key-partitioned shuffle
    (the UDF must not force one; ensure_parallelism's round-robin
    widening is the only allowed Exchange), and the Python boundary
    is the vectorized ArrowEvalPython, never row-at-a-time
    BatchEvalPython."""
    plan = _plan(spark, "docs_nfc_normalize")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_png_decode_partition_preserving(spark):
    """media_png_decode_stats: synthesize + decode are chained
    mapInPandas stages with no key-partitioned shuffle between them
    (only ensure_parallelism's round-robin widening) — decode
    parallelism IS the upstream split count."""
    plan = _plan(spark, "media_png_decode_stats")
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("MapInPandas") >= 2, plan


def test_crawl_admit_exchanges_keyed_not_text(spark):
    """docs_crawl_admit (round 9): every hash exchange is keyed on
    canon_url / _fp / doc_id — admission verdicts move on keys; the
    text column rides rows through the keeper join but never KEYS an
    exchange. Dim-sized sides broadcast at this SF (Catalyst's call,
    not a hint)."""
    plan = _plan(spark, "docs_crawl_admit")
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert hashex, "expected keeper-agg exchanges"
    for l in hashex:
        assert ("canon_url" in l) or ("_fp" in l) or ("doc_id" in l), l


def test_simhash_md5_banding_exchanges_and_no_quadratic_join(spark):
    """docs_simhash_neardup_md5 (round 9): the banded candidate path
    must survive — exchanges keyed on (chunk_idx, chunk) and
    (d1, d2) only (the fingerprint table is behind its eager
    checkpoint), and no nested-loop/sort-merge pair join anywhere
    (the quadratic form lives ONLY in the DuckDB oracle)."""
    plan = _plan(spark, "docs_simhash_neardup_md5")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    for l in hashex:
        assert ("chunk" in l) or ("d1" in l) or ("d2" in l), l


def test_trgm_multi_search_one_setwise_pass(spark):
    """docs_trgm_multi_search (round 9): the 16-pattern probe rides
    ONE set-wise pass — the (pattern, tri) dim and the per-pattern
    need table BROADCAST (never shuffle the postings against them),
    and the only hash exchanges are the (pattern, doc) candidate
    count keys."""
    plan = _plan(spark, "docs_trgm_multi_search")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert hashex
    for l in hashex:
        assert "pattern" in l and "doc_id" in l, l


def test_phrase_search_map_only_with_pushed_gates(spark):
    """docs_phrase_search (round 9): the corpus-scan match_phrase is
    MAP-ONLY — zero exchanges of any kind — and the per-term
    CONTAINS gates reach the parquet scan as PushedFilters
    (StringContains), so non-matching row groups never tokenize.
    clearCache first: other modules' fixtures cache the documents
    table, and the cache manager would substitute InMemoryRelation
    for the scan (hiding pushdown — in production the gate pushes;
    against a cached table the in-memory filter is just as cheap)."""
    spark.catalog.clearCache()
    plan = _plan(spark, "docs_phrase_search")
    assert "Exchange" not in plan, plan
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "StringContains" in pushed, pushed


def test_phrase_search_indexed_probe_shape(spark):
    """docs_phrase_search_indexed (round 9): the positional-index
    probe filters postings by term IN (...) BEFORE its one partial-
    agg exchange — the only hash exchange is keyed on doc_id, and
    the position intersection is in-row (no join at all)."""
    plan = _plan(spark, "docs_phrase_search_indexed")
    assert "Join" not in plan, plan
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert hashex, "expected the per-doc position-pivot exchange"
    for l in hashex:
        assert "doc_id" in l, l


def test_highlight_map_only_pushed_contains(spark):
    """docs_highlight (round 9): snippet assembly is map-only (zero
    exchanges) with the CONTAINS gate pushed to the scan (clearCache:
    see test_phrase_search_map_only_with_pushed_gates)."""
    spark.catalog.clearCache()
    plan = _plan(spark, "docs_highlight")
    assert "Exchange" not in plan, plan
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "StringContains" in pushed, pushed


def test_search_after_keyset_shape(spark):
    """events_search_after (round 9): keyset pagination must compile
    to TakeOrderedAndProject (never a global sort) with the cursor's
    coarse ts bound reaching the scan as a pushed GreaterThan — the
    deep-page property that OFFSET pagination cannot have."""
    plan = _plan(spark, "events_search_after")
    assert "TakeOrderedAndProject" in plan, plan
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "ts" in pushed, pushed


def test_composite_agg_page_shape(spark):
    """events_composite_agg (round 9): one partial-agg exchange on
    the composite (user_id, event_type) key, then a TakeOrdered page
    cut — the after-key filter must NOT force a second exchange."""
    plan = _plan(spark, "events_composite_agg")
    assert "TakeOrderedAndProject" in plan, plan
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert len(hashex) >= 1
    for l in hashex:
        assert "user_id" in l and "event_type" in l, l


def test_geo_distance_box_pushed_map_only_agg(spark):
    """events_geo_distance (round 9): the bounding-box comparisons
    are scan-level (the synthetic point is derived in-row, so the
    filter sits right on top of the scan with no exchange before
    it); the only hash exchange is the event_type aggregate key."""
    plan = _plan(spark, "events_geo_distance")
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert hashex
    for l in hashex:
        assert "event_type" in l or "user_id" in l, l
    assert "Join" not in plan, plan


def test_geotile_grid_one_cell_exchange_takeordered(spark):
    """events_geotile_grid (round 9): cell derivation is in-row;
    exchanges are keyed on the (cell_x, cell_y) grid key (plus the
    distinct-user expansion on the same key), and the top-15 page is
    a TakeOrdered, never a global sort."""
    plan = _plan(spark, "events_geotile_grid")
    assert "TakeOrderedAndProject" in plan, plan
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert hashex
    for l in hashex:
        assert "cell_x" in l and "cell_y" in l, l


def test_pipeline_aggs_bucket_sized_window(spark):
    """events_pipeline_aggs (round 9): the date histogram is ONE
    day-keyed partial-agg exchange; the pipeline functions
    (cumulative sum, derivative, moving average) run as window
    expressions over the bucket-sized frame — the only other
    exchange is the SinglePartition gather of ~30 day rows, and
    nothing re-shuffles the corpus."""
    plan = _plan(spark, "events_pipeline_aggs")
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert hashex
    for l in hashex:
        # Catalyst names the in-row to_date group key _groupingexpression
        assert "day" in l or "_groupingexpression" in l, l
    assert plan.count("Window") >= 1, plan
    # all four pipeline functions fold into ONE Window operator over
    # the bucket-sized frame — never one window pass each
    assert plan.count("(RowFrame") >= 1 and "Join" not in plan, plan
    win_args = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert len(win_args) == 1, win_args


def test_decontaminate_eval_gate_before_distinct(spark):
    """docs_decontaminate (round 9): the train gram stream must pass
    the broadcast eval-gram semi-join BEFORE its distinct — the
    corpus-sized exchange becomes matched-grams-sized. Pin: a
    LeftSemi broadcast join exists, and no SortMergeJoin anywhere
    (the overlap join stays hash/broadcast on 8-byte keys)."""
    plan = _plan(spark, "docs_decontaminate")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_prep_pipeline_contamination_is_ungated(spark):
    """docs_prep_pipeline (round 10 — VERDICT r9 wrong #1): the
    contamination stage inside prep_corpus must run UNGATED — its
    ngram_contamination TEST-param side is the 90% train corpus, so
    the gate's broadcast-the-distinct-gram-set probe would be
    corpus-proportional (driver OOM at scale). Pin: no semi-join
    keyed on gram hashes anywhere in the plan (the LeftSemi joins
    prep does have are all doc_id-keyed admission filters); the
    overlap join stays the plain AQE-broadcastable equality join."""
    import re as _re

    plan = _plan(spark, "docs_prep_pipeline")
    gated = _re.findall(r"Join \[h#\d+L?\], \[h#\d+L?\], LeftSemi", plan)
    assert not gated, gated


def test_span_near_probe_shape(spark):
    """docs_span_near (round 9): same probe shape as the phrase
    index — term IN (...) before the one doc-keyed pivot exchange,
    chain math in-row, no join."""
    plan = _plan(spark, "docs_span_near")
    assert "Join" not in plan, plan
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert hashex
    for l in hashex:
        assert "doc_id" in l, l


def test_phrase_atrest_partition_filters(spark):
    """docs_phrase_search_atrest (round 9): the at-rest probe's
    literal term-bucket list must land as storage-level
    PartitionFilters (only the probed bucket directories are read),
    and the probe itself keeps the index shape — doc_id-keyed
    exchange only, no join."""
    import re as _re

    df = entrymod.queries()["docs_phrase_search_atrest"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("term_bkt" in m for m in pf), plan[:2000]
    fplan = _plan(spark, "docs_phrase_search_atrest")
    assert "Join" not in fplan, fplan


def test_bm25_atrest_partition_filters_and_values(spark):
    """docs_bm25_atrest (round 10): the at-rest BM25 probe's literal
    term-bucket list must land as storage-level PartitionFilters
    (only the probed bucket directories are read), and its values
    must be BIT-IDENTICAL to the corpus-scan docs_bm25_search — the
    third physical path on the one BM25 oracle."""
    import re as _re

    df = entrymod.queries()["docs_bm25_atrest"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("term_bkt" in m for m in pf), plan[:2000]
    got = [(r.doc_id, r.score) for r in df.collect()]
    want = [
        (r.doc_id, r.score)
        for r in entrymod.queries()["docs_bm25_search"](spark, SF).collect()
    ]
    assert got == want


def test_rare_terms_bottomk_shape(spark):
    """docs_rare_terms (round 9): one term-keyed partial-agg
    exchange, bottom-k via TakeOrderedAndProject (never a global
    sort), no join."""
    plan = _plan(spark, "docs_rare_terms")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert hashex
    for l in hashex:
        assert "term" in l, l


def test_adjacency_matrix_single_pass(spark):
    """events_adjacency_matrix (round 9): the whole filter matrix is
    ONE aggregate pass over the scan — no hash exchange (only the
    final single-partition gather), no join, one scan."""
    plan = _plan(spark, "events_adjacency_matrix")
    assert "hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan
    # the formatted plan names each node twice (tree + detail):
    # exactly one scan node => exactly two mentions
    assert plan.count("Scan parquet") == 2, plan


def test_fuzzy_atrest_walks_vocab_and_prunes_postings(spark):
    """docs_fuzzy_term_search_atrest (round 10): the postings fetch
    must carry term_bkt PartitionFilters (only the matched types'
    bucket dirs are read — the term-discovery walk happens on the
    vocab sidecar, never the postings), and values must equal the
    corpus-scan form exactly."""
    import re as _re

    df = entrymod.queries()["docs_fuzzy_term_search_atrest"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("term_bkt" in m for m in pf), plan[:2000]
    got = {(r.term, r.doc_id) for r in df.collect()}
    want = {
        (r.term, r.doc_id)
        for r in entrymod.queries()["docs_fuzzy_term_search"](
            spark, SF
        ).collect()
    }
    assert got == want


def test_mlt_atrest_point_lookup_and_pruned_postings(spark):
    """docs_more_like_this_atrest (round 10): the candidate postings
    fetch carries term_bkt PartitionFilters; the query docs come
    from an id-pushdown corpus point lookup (doc_id pushed to the
    documents scan); scores bit-equal the inline form."""
    import re as _re

    df = entrymod.queries()["docs_more_like_this_atrest"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("term_bkt" in m for m in pf), plan[:2000]
    # the query-doc term vectors run at construction time (the tiny
    # qterms collect), so the id pushdown is asserted on the
    # point-lookup frame itself
    from irclogbot_spark.sources.tables import load_table

    lookup = load_table(spark, SF, "documents").filter(
        F.col("doc_id").isin([0, 1, 2])
    )
    lplan = lookup._jdf.queryExecution().executedPlan().toString()
    pushed = _re.findall(r"PushedFilters: \[([^\]]*)\]", lplan)
    assert any("doc_id" in m and "In" in m for m in pushed), pushed
    got = [tuple(r) for r in df.orderBy("query_id", "rnk").collect()]
    want = [
        tuple(r)
        for r in entrymod.queries()["docs_more_like_this"](spark, SF)
        .orderBy("query_id", "rnk")
        .collect()
    ]
    assert got == want


def test_suggest_atrest_reads_dictionary_only(spark):
    """docs_prefix_suggest_atrest (round 10): the completion probe
    must read ONLY the vocab sidecar — no postings scan anywhere in
    the plan — and equal the corpus-scan suggester exactly."""
    df = entrymod.queries()["docs_prefix_suggest_atrest"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "vocab" in plan, plan[:2000]
    assert "postings" not in plan, plan[:2000]
    got = [tuple(r) for r in df.collect()]
    want = [
        tuple(r)
        for r in entrymod.queries()["docs_prefix_suggest"](spark, SF).collect()
    ]
    assert got == want


def test_wildcard_indexed_partition_filters_and_values(spark):
    """docs_wildcard_search_indexed (round 10): the persisted-index
    probe must carry tri_bkt PartitionFilters (only the literal-run
    trigrams' bucket dirs are read) and equal the inline form
    exactly."""
    import re as _re

    df = entrymod.queries()["docs_wildcard_search_indexed"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("tri_bkt" in m for m in pf), plan[:2000]
    got = {(r.pattern, r.doc_id) for r in df.collect()}
    want = {
        (r.pattern, r.doc_id)
        for r in entrymod.queries()["docs_wildcard_search"](spark, SF).collect()
    }
    assert got == want


def test_collapse_by_source_window_group_limit(spark):
    """docs_collapse_by_source (round 10): the per-group cut must
    run as WindowGroupLimit (partial top-k BEFORE the one
    source-keyed exchange — the collapse stays group-bounded at any
    corpus size), with no join anywhere."""
    df = entrymod.queries()["docs_collapse_by_source"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert len(hashex) == 1 and "source" in hashex[0], hashex


def test_collapse_atrest_partition_filters_and_values(spark):
    """docs_collapse_by_source_atrest (round 11): scores come from
    the bucket-pruned postings probe (term_bkt PartitionFilters),
    the collapse field from a column-pruned (doc_id, source) corpus
    fetch, and WindowGroupLimit cuts each source group before the
    exchange; rows equal the scan-form collapse exactly."""
    import re as _re

    df = entrymod.queries()["docs_collapse_by_source_atrest"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("term_bkt" in m for m in pf), plan[:2000]
    assert "WindowGroupLimit" in plan, plan[:2000]
    # the stored-fields fetch is column-pruned: the documents scan
    # reads only (doc_id, source), never text
    rs = _re.findall(r"ReadSchema: ([^\n]*)", plan)
    doc_scans = [m for m in rs if "source" in m]
    assert doc_scans and all("text" not in m for m in doc_scans), rs
    got = [tuple(r) for r in df.orderBy("source", "rnk").collect()]
    want = [
        tuple(r)
        for r in entrymod.queries()["docs_collapse_by_source"](spark, SF)
        .orderBy("source", "rnk")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_compound_scan_forms_shuffle_nothing(spark):
    """Round 11 (the SCALE.md claim, pinned): every scan-form
    compound query — bool, dis_max, boosting, constant_score,
    function_score — plans ZERO shuffle exchanges. The only
    exchanges allowed are broadcast (the 1-row stats frame); the
    top-k is TakeOrderedAndProject, never Sort+Exchange."""
    import re as _re

    for name in [
        "docs_bool_search",
        "docs_dis_max_search",
        "docs_boosting_search",
        "docs_constant_score",
        "docs_function_score",
        # round 12: multi_match best_fields shares the scan contract
        # (per-field tf/dl in one in-row projection, ONE broadcast
        # stats row, map-side dis_max combine); most_fields is the
        # same frame with the sum combine; simple_query_string
        # compiles ONTO bool_search, so its plan IS the bool plan
        # (the registered query is prefix-free — no vocab distinct)
        "docs_multi_match",
        "docs_multi_match_most_fields",
        # round 13: cross_fields is one different map-side expression
        # (blended df = greatest of the already-computed per-field
        # dfs) over the identical frame — still zero corpus shuffles
        "docs_multi_match_cross_fields",
        "docs_simple_query_string",
        # terms_set: the per-doc msm field rides the same in-row
        # projection as the tf columns
        "docs_terms_set",
    ]:
        df = entrymod.queries()[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        shuffles = [
            m
            for m in _re.findall(r"Exchange \w+", plan)
            if "SinglePartition" not in m and "Broadcast" not in m
        ]
        assert not shuffles, (name, shuffles, plan[:1500])
        # the stats aggregate legitimately gathers to one partition;
        # anything hash/range-partitioned would be a corpus shuffle
        hashed = [m for m in _re.findall(r"Exchange hashpartitioning[^\n]*", plan)]
        ranged = [m for m in _re.findall(r"Exchange rangepartitioning[^\n]*", plan)]
        assert not hashed and not ranged, (name, hashed, ranged, plan[:1500])
        assert "TakeOrderedAndProject" in plan, (name, plan[:1500])


def test_multi_match_atrest_prunes_both_field_indexes(spark):
    """Round 12: docs_multi_match_atrest probes ONE index PER FIELD
    (a field is its own index in ES) — BOTH postings scans carry
    term_bkt PartitionFilters (only the probed bucket directories
    are read); the corpus text is never scanned; top-k is a partial
    TakeOrdered."""
    import re as _re

    df = entrymod.queries()["docs_multi_match_atrest"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [m for m in _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
          if "term_bkt" in m]
    assert len(pf) >= 2, plan[:2000]  # one pruned probe per field index
    # document text never read: no ReadSchema carries the text column
    rs = _re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert all("text:" not in m and '"text"' not in m for m in rs), rs
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_match_phrase_prefix_atrest_walks_vocab_and_prunes(spark):
    """Round 12: log_match_phrase_prefix_atrest expands the prefix
    against the vocab sidecar (driver-side bounded collect, the
    fuzzy convention) and fetches only the fixed + expanded terms'
    postings with term_bkt PartitionFilters."""
    import re as _re

    df = entrymod.queries()["log_match_phrase_prefix_atrest"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("term_bkt" in m for m in pf), plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:1500]
