"""Driver-contract invariants: the registration-order rules the
CORRECTNESS harness depends on. The driver records the FIRST 50
queries; `irclogbot_spark.queries._DRIVER_WINDOW` controls that
window explicitly and is rotated per round so every oracle-paired
query accumulates driver-recorded verification (round 5 pulled in
the 25 round-3/4 flagships that had only local parity checks)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from irclogbot_spark.queries import _DRIVER_WINDOW


def test_window_is_exactly_the_first_50_registrations():
    qs = list(entrymod.queries())
    assert len(_DRIVER_WINDOW) == 50
    assert qs[:50] == _DRIVER_WINDOW


def test_every_recorded_registration_is_oracle_paired():
    qs = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    first50 = set(qs[:50])
    assert first50 <= oracles, (
        "every query inside the driver's 50-row record window must "
        f"be oracle-paired; unpaired inside window: {sorted(first50 - oracles)}"
    )


def test_rows_only_queries_register_after_the_cap():
    """The queries with no SQL-expressible oracle (xxhash twins,
    blake2b compat ids, sketch aggregates, zlib) must stay in the
    tail — inside the window they would waste a hard-check slot on a
    rows-only comparison."""
    qs = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    unpaired = set(qs) - oracles
    assert unpaired == {
        "docs_minhash_neardup",
        "docs_simhash_neardup",
        "ingest_compat_ids",
        "docs_prep_pipeline_fast",
        "docs_dedup_keep_best_fast",
        "docs_substring_dedup_fast",
        "events_approx_stats",
        "docs_compression_ratio",
        "docs_corpus_shuffle_fast",
    }
    assert unpaired <= set(qs[50:])


def test_rotated_out_queries_remain_registered_and_paired():
    """Rotation must never DROP a query: every set that ever moved to
    the tail (round-4 and round-6 rotations) stays registered (the
    local parity suite still value-checks every oracle-paired name)."""
    qs = set(entrymod.queries())
    rotated_out = {
        # round-6 rotation: the long-stable core moves to the tail
        "ingest_filter_stats",
        "ingest_dedup",
        "ingest_action_rows",
        "channels_catalog",
        "log_term_time_filter",
        "log_point_lookup",
        "log_msgs_per_channel_day",
        "log_top_nicks",
        "log_search_terms",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "join_anti_customers_no_orders",
        "join_semi_parts_ordered",
        "agg_rollup_sets",
        "events_session_window",
        "docs_bm25_search",
        "docs_decontaminate",
        "emb_knn_join",
        # round-4 rotation
        "log_nick_rank_per_channel",
        "log_inter_message_gap",
        "join_top_customers",
        "set_ops",
        "scalar_human_fmt",
        "events_windows",
        "events_json_extract",
        "docs_token_stats",
        "docs_quality",
        "emb_cosine_neardup",
        "docs_neardup_jaccard",
        "docs_neardup_clusters",
        "docs_dedup_pipeline",
        "docs_dedup_keep_first",
        "docs_lang_id",
        "docs_prep_pipeline",
        "docs_sample_split",
        "docs_lm_score",
        "docs_pack_sequences",
        "docs_pii_redact",
        "emb_ann_topk",
        "emb_ivf_topk",
        "emb_ann_recall",
        "media_decode_stats",
        "window_date_functions",
        "math_array_functions",
        "agg_stats",
        "agg_pivot",
    }
    assert rotated_out <= qs
    oracles = set(entrymod.oracle_sql())
    assert rotated_out <= oracles


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, name


def test_bench_covers_every_registered_query():
    # VERDICT r7 missing #4: every name in queries() must have a
    # recorded bench time — HEADLINE (median-of-3) or CHEAP (single
    # warmed pass). A new registration missing from both lists fails
    # here instead of silently going unbenched.
    import bench

    qs = set(entrymod.queries())
    benched = set(bench.HEADLINE) | set(bench.CHEAP)
    assert benched == qs, (
        sorted(qs - benched),  # registered but unbenched
        sorted(benched - qs),  # benched but unregistered (stale name)
    )
    assert not set(bench.HEADLINE) & set(bench.CHEAP)
