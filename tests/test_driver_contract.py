"""Driver-contract invariants: the registration-order rules the
CORRECTNESS harness depends on (the driver records the FIRST 50
queries; every oracle-paired query must land inside that window)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_first_50_registrations_are_exactly_the_oracle_paired_set():
    qs = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert len(oracles) == 50, f"oracle count drifted: {len(oracles)}"
    first50 = set(qs[:50])
    assert first50 == oracles, (
        "oracle-paired queries must register before the driver's "
        f"50-row cap; missing from window: {sorted(oracles - first50)}; "
        f"unpaired inside window: {sorted(first50 - oracles)}"
    )


def test_rows_only_queries_register_after_the_cap():
    qs = list(entrymod.queries())
    tail = set(qs[50:])
    assert tail == {
        "docs_minhash_neardup",
        "docs_simhash_neardup",
        "ingest_compat_ids",
        "docs_prep_pipeline_fast",
    }


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, name
