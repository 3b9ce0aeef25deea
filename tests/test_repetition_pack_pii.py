"""Behavior tests for the round-3 LLM-pipeline operators: repetition
signals, sequence packing, PII redaction, LM familiarity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irclogbot_spark.functions.pii import pii_count, pii_redact
from irclogbot_spark.operators.lm import bigram_vocab, lm_familiarity
from irclogbot_spark.operators.packing import pack_sequences
from irclogbot_spark.operators.repetition import repetition_signals


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestRepetitionSignals:
    def test_pure_repetition_saturates(self, spark):
        # "x y x y ..." — every 2-gram is 'x y' or 'y x'; top fraction
        # is the heavier of the two, dup fraction is 1.0 (every 5-gram
        # repeats).
        out = repetition_signals(
            _docs(spark, [(1, "x y " * 20)]), top_n=2, dup_n=5
        ).collect()[0]
        assert out.n_top_grams == 39
        assert out.top2gram_frac == pytest.approx(20 / 39)
        assert out.dup5gram_frac == 1.0

    def test_all_distinct_has_zero_dup(self, spark):
        text = " ".join(f"w{i}" for i in range(30))
        out = repetition_signals(_docs(spark, [(1, text)])).collect()[0]
        assert out.n_top_grams == 29
        assert out.dup5gram_frac == 0.0
        # every 2-gram unique: top mass = the longest gram's chars / total
        assert 0 < out.top2gram_frac < 0.1

    def test_short_docs_kept_with_zeros(self, spark):
        out = {
            r.doc_id: r
            for r in repetition_signals(
                _docs(spark, [(1, "solo"), (2, ""), (3, "a b c")])
            ).collect()
        }
        assert set(out) == {1, 2, 3}
        assert out[1].n_top_grams == 0 and out[1].top2gram_frac == 0.0
        assert out[2].n_dup_grams == 0 and out[2].dup5gram_frac == 0.0
        assert out[3].n_top_grams == 2 and out[3].n_dup_grams == 0

    def test_repartition_invariant(self, spark):
        rows = [(i, f"tok{i % 3} " * (i % 7 + 2)) for i in range(40)]
        a = repetition_signals(_docs(spark, rows)).collect()
        b = repetition_signals(_docs(spark, rows).repartition(7)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestPackSequences:
    def test_contiguous_chunking_within_shard(self, spark):
        # one shard (shards=1): docs in id order, 512-token budget
        rows = [(i, "t " * 200) for i in range(6)]  # 200 tokens each
        out = {
            r.doc_id: r
            for r in pack_sequences(
                _docs(spark, rows), budget=512, shards=1
            ).collect()
        }
        # cumulative starts: 0,200,400,600,800,1000 -> seqs 0,0,0,1,1,1
        assert [out[i].seq_id for i in range(6)] == [0, 0, 0, 1, 1, 1]
        assert out[3].seq_offset == 600 - 512
        assert all(out[i].n_tokens == 200 for i in range(6))

    def test_shards_partition_docs_and_parallelize(self, spark):
        rows = [(i, "a b c") for i in range(32)]
        out = pack_sequences(_docs(spark, rows), budget=8, shards=4).collect()
        assert {r.shard for r in out} == {0, 1, 2, 3}
        for r in out:
            assert r.shard == r.doc_id % 4
        # within a shard, offsets restart every budget tokens
        shard0 = sorted((r for r in out if r.shard == 0), key=lambda r: r.doc_id)
        starts = [r.seq_id * 8 + r.seq_offset for r in shard0]
        assert starts == [3 * i for i in range(len(shard0))]

    def test_empty_doc_packs_at_cursor(self, spark):
        rows = [(0, "x " * 10), (1, ""), (2, "y " * 5)]
        out = {r.doc_id: r for r in pack_sequences(_docs(spark, rows), 512, 1).collect()}
        assert out[1].n_tokens == 0
        assert out[1].seq_offset == 10 and out[2].seq_offset == 10


class TestPii:
    def test_counts_and_redaction(self, spark):
        df = _docs(
            spark,
            [(1, "mail a.b-c_d@ex-site.org or root@h.io, ip 192.168.0.1, acct 1234567 ok")],
        )
        row = df.select(
            pii_count("text", "email").alias("e"),
            pii_count("text", "ipv4").alias("i"),
            pii_count("text", "digits").alias("d"),
            pii_redact("text").alias("r"),
        ).collect()[0]
        assert (row.e, row.i, row.d) == (2, 1, 1)
        assert row.r == "mail <EMAIL> or <EMAIL>, ip <IP>, acct <NUM> ok"

    def test_negatives_untouched(self, spark):
        text = "ver 1.2.3 at x@y (no tld dot), short 12345, a.b.c.d"
        row = _docs(spark, [(1, text)]).select(
            pii_count("text", "email").alias("e"),
            pii_count("text", "ipv4").alias("i"),
            pii_count("text", "digits").alias("d"),
            pii_redact("text").alias("r"),
        ).collect()[0]
        # 'x@y' has no dot-TLD; '12345' is 5 digits; 'a.b.c.d' not numeric
        assert (row.e, row.i, row.d) == (0, 0, 0)
        assert row.r == text

    def test_email_redacted_before_digit_rule(self, spark):
        row = _docs(spark, [(1, "u1234567@ex.com")]).select(
            pii_redact("text").alias("r")
        ).collect()[0]
        assert row.r == "<EMAIL>"


class TestPrepCorpus:
    def test_stages_compose(self, spark):
        from irclogbot_spark.operators.prep import prep_corpus

        rows = [(i, f"alpha beta w{i} x{i} y{i} z{i} q{i} r{i} s{i} t{i}", "en") for i in range(20)]
        rows.append((100, "spam spam spam spam spam spam spam spam", "en"))  # repetition-gated
        rows.append((101, "tiny doc", "en"))  # min-token-gated
        rows.append((102, rows[0][1], "en"))  # exact dup of doc 0 -> dropped
        df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
        out = prep_corpus(df, budget=16, shards=2, min_tokens=5)
        got = {r.doc_id: r for r in out.collect()}
        assert 100 not in got and 101 not in got and 102 not in got
        assert set(got) <= {r[0] for r in rows}
        for r in got.values():
            assert r.shard == r.doc_id % 2
            assert r.split in {"train", "val", "test"}
            assert 0 <= r.seq_offset < 16

    def test_contaminated_train_doc_dropped(self, spark):
        from irclogbot_spark.operators.prep import prep_corpus

        # force a train doc to share its whole text with a test doc:
        # craft ids whose portable draw lands one in 'test', then give
        # a train doc the same 8-gram. Use a seeded scan to find ids.
        from irclogbot_spark.operators.sampling import portable_draw, split_columns

        base = spark.range(0, 200).select(
            F.col("id").alias("doc_id"),
            split_columns(["doc_id"], {"train": 0.9, "val": 0.05, "test": 0.05},
                          "prep", portable_draw).alias("split"),
        )
        splits = {r.doc_id: r.split for r in base.collect()}
        test_id = next(i for i, s in splits.items() if s == "test")
        train_id = next(i for i, s in splits.items() if s == "train")
        other_id = next(i for i, s in splits.items() if s == "train" and i != train_id)
        shared = "one two three four five six seven eight"
        rows = [
            (int(test_id), shared + " held out tail", "en"),
            (int(train_id), shared + " training copy tail", "en"),
            (int(other_id), "totally different words nothing shared here at all okay", "en"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
        # relax the repetition gate: on 10-token docs a single 2-gram
        # already exceeds 12% of gram mass — this test isolates stage 4
        out = {
            r.doc_id: r.split
            for r in prep_corpus(
                df, budget=16, shards=1, max_top2gram_frac=1.0,
                draw_fn=portable_draw,
            ).collect()
        }
        assert int(train_id) not in out          # contaminated -> dropped
        assert out[int(test_id)] == "test"       # eval set intact
        assert out[int(other_id)] == "train"     # clean train doc kept


class TestLmFamiliarity:
    def test_outlier_doc_scores_low(self, spark):
        # 9 docs of common bigrams + 1 doc of singleton bigrams:
        # with K large enough for every repeated bigram, the outlier's
        # bigrams still enter the vocab (count 1 each) unless K is
        # tight — so use a small K to model a trusted-vocab cutoff.
        rows = [(i, "the cat sat on the mat") for i in range(9)]
        rows.append((9, "zq xv wk jn pb"))
        out = {r.doc_id: r for r in lm_familiarity(_docs(spark, rows), vocab_k=5).collect()}
        assert out[0].familiar_frac == 1.0
        assert out[9].familiar_frac == 0.0
        assert out[0].avg_gram_freq == pytest.approx(9.0)

    def test_cross_corpus_scoring(self, spark):
        # CCNet setup: vocab from a trusted corpus, scored corpus differs
        trusted = _docs(spark, [(0, "a b c d"), (1, "a b c d")])
        vocab = bigram_vocab(trusted, vocab_k=10)
        cand = _docs(spark, [(5, "a b x y")])
        row = lm_familiarity(cand, vocab=vocab).collect()[0]
        assert row.n_bigrams == 3 and row.n_familiar == 1
        assert row.familiar_frac == pytest.approx(1 / 3)

    def test_short_doc_scores_zero(self, spark):
        row = lm_familiarity(_docs(spark, [(1, "solo")]), vocab_k=5).collect()[0]
        assert (row.n_bigrams, row.n_familiar, row.familiar_frac, row.avg_gram_freq) == (
            0, 0, 0.0, 0.0,
        )

    def test_vocab_boundary_deterministic(self, spark):
        # ties at the K boundary break on gram ASC — stable under
        # repartitioning
        rows = [(i, f"t{i} u{i}") for i in range(20)]  # 20 singleton bigrams
        v1 = sorted(r.gram for r in bigram_vocab(_docs(spark, rows), 7).collect())
        v2 = sorted(
            r.gram
            for r in bigram_vocab(_docs(spark, rows).repartition(5), 7).collect()
        )
        assert v1 == v2 and len(v1) == 7


class TestProperties:
    def test_pii_redaction_idempotent(self, spark):
        # second pass finds nothing: tags carry no digits/addresses
        import random

        rng = random.Random(7)
        frag = ["mail", "a@b.co", "10.1.2.3", "x", "1234567", "9.9", "u_1@ex.org", "-"]
        rows = [
            (i, " ".join(rng.choice(frag) for _ in range(rng.randint(0, 12))))
            for i in range(60)
        ]
        df = _docs(spark, rows)
        once = df.select("doc_id", pii_redact("text").alias("r"))
        twice = once.select("doc_id", pii_redact(F.col("r")).alias("r"))
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    def test_packing_invariants_random_corpus(self, spark):
        import random

        rng = random.Random(13)
        rows = [(i, "w " * rng.randint(0, 40)) for i in range(200)]
        out = pack_sequences(_docs(spark, rows), budget=64, shards=4).collect()
        assert len(out) == 200
        for r in out:
            assert 0 <= r.seq_offset < 64
            assert r.shard == r.doc_id % 4
        # per (shard): seq ids are nondecreasing in doc order and
        # tok_start reconstructs the exclusive cumulative sum
        by_shard = {}
        for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
            cursor = by_shard.get(r.shard, 0)
            assert r.seq_id * 64 + r.seq_offset == cursor
            by_shard[r.shard] = cursor + r.n_tokens


class TestStreamingComposability:
    def test_pii_scrub_runs_in_structured_streaming(self, spark, tmp_path):
        """The map-only scrub/quality expressions apply unchanged to a
        readStream frame — the batch/stream-agnostic contract the
        ingest chain already honors, proven for the new functions."""
        import json
        import os

        src = tmp_path / "in"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(
                json.dumps({"doc_id": i, "text": f"doc {i} mail u{i}@ex.org ip 10.0.0.{i}"})
                for i in range(5)
            )
        )
        stream = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .json(str(src))
            .select(
                "doc_id",
                pii_count("text", "email").alias("n_emails"),
                pii_redact("text").alias("redacted"),
            )
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("scrubbed")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        rows = {r.doc_id: r for r in spark.sql("SELECT * FROM scrubbed").collect()}
        assert len(rows) == 5
        assert all(r.n_emails == 1 for r in rows.values())
        assert rows[3].redacted == "doc 3 mail <EMAIL> ip <IP>"


class TestCrossDocDuplication:
    def test_shared_span_flagged_both_docs(self, spark):
        from irclogbot_spark.operators.crossdup import cross_doc_duplication

        shared = " ".join(f"s{i}" for i in range(20))
        rows = [
            (1, shared + " unique tail one two three"),
            (2, "prefix words here " + shared),
            (3, " ".join(f"u{i}" for i in range(25))),
            (4, "short doc"),
        ]
        out = {r.doc_id: r for r in cross_doc_duplication(_docs(spark, rows), n=20).collect()}
        assert out[1].n_shared_spans >= 1 and out[2].n_shared_spans >= 1
        assert out[3].n_shared_spans == 0 and out[3].cross_dup_frac == 0.0
        assert out[4].n_spans == 0 and out[4].cross_dup_frac == 0.0
        # doc 3 has 6 distinct 20-gram spans, none shared
        assert out[3].n_spans == 6

    def test_identical_docs_fully_shared(self, spark):
        from irclogbot_spark.operators.crossdup import cross_doc_duplication

        text = " ".join(f"w{i}" for i in range(30))
        out = cross_doc_duplication(_docs(spark, [(1, text), (2, text)]), n=20).collect()
        assert all(r.cross_dup_frac == 1.0 for r in out)


class TestPythonReferenceParity:
    """Independent pure-Python reference implementations — unlike the
    DuckDB oracles (which share the relational formulation), these
    recompute each signal imperatively from first principles."""

    def _rand_docs(self, seed, n_docs=40, vocab=8):
        import random

        rng = random.Random(seed)
        return [
            (i, " ".join(f"w{rng.randrange(vocab)}" for _ in range(rng.randrange(0, 30))))
            for i in range(n_docs)
        ]

    def test_repetition_vs_counter_reference(self, spark):
        from collections import Counter

        rows = self._rand_docs(99)
        got = {r.doc_id: r for r in repetition_signals(_docs(spark, rows)).collect()}
        for doc_id, text in rows:
            toks = text.split()
            r = got[doc_id]
            for n, frac_field, count_field in (
                (2, "top2gram_frac", "n_top_grams"),
                (5, "dup5gram_frac", "n_dup_grams"),
            ):
                grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                c = Counter(grams)
                assert getattr(r, count_field) == len(grams)
                total = sum(cnt * len(g) for g, cnt in c.items())
                if n == 2:
                    expect = max((cnt * len(g) for g, cnt in c.items()), default=0)
                else:
                    expect = sum(cnt * len(g) for g, cnt in c.items() if cnt > 1)
                assert getattr(r, frac_field) == pytest.approx(
                    expect / total if total else 0.0
                ), (doc_id, n)

    def test_packing_vs_cumsum_reference(self, spark):
        rows = self._rand_docs(7)
        budget, shards = 32, 4
        got = {r.doc_id: r for r in pack_sequences(_docs(spark, rows), budget, shards).collect()}
        cursors = {}
        for doc_id, text in sorted(rows):
            ntok = len(text.split())
            shard = doc_id % shards
            start = cursors.get(shard, 0)
            r = got[doc_id]
            assert (r.shard, r.n_tokens, r.seq_id, r.seq_offset) == (
                shard, ntok, start // budget, start % budget,
            ), doc_id
            cursors[shard] = start + ntok

    def test_lm_vs_counter_reference(self, spark):
        from collections import Counter

        rows = self._rand_docs(21, vocab=5)
        k = 7
        got = {r.doc_id: r for r in lm_familiarity(_docs(spark, rows), vocab_k=k).collect()}
        corpus = Counter()
        for _, text in rows:
            toks = text.split()
            corpus.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
        vocab = dict(sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:k])
        for doc_id, text in rows:
            toks = text.split()
            grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
            r = got[doc_id]
            assert r.n_bigrams == len(grams)
            shared = sum(1 for g in grams if g in vocab)
            mass = sum(vocab.get(g, 0) for g in grams)
            assert r.n_familiar == shared, doc_id
            assert r.familiar_frac == pytest.approx(shared / len(grams) if grams else 0.0)
            assert r.avg_gram_freq == pytest.approx(mass / len(grams) if grams else 0.0)

    def test_crossdup_vs_set_reference(self, spark):
        from irclogbot_spark.operators.crossdup import cross_doc_duplication

        rows = self._rand_docs(55, n_docs=30, vocab=3)
        n = 6
        got = {r.doc_id: r for r in cross_doc_duplication(_docs(spark, rows), n=n).collect()}
        spans = {
            doc_id: {" ".join(text.split()[i : i + n])
                     for i in range(len(text.split()) - n + 1)}
            for doc_id, text in rows
        }
        for doc_id, text in rows:
            mine = spans[doc_id]
            others = set().union(*(s for d, s in spans.items() if d != doc_id))
            r = got[doc_id]
            assert r.n_spans == len(mine), doc_id
            assert r.n_shared_spans == len(mine & others), doc_id


def test_repetition_single_family_matches_full(spark):
    """families=("top",) returns exactly the top-family columns of
    the two-family computation (prep_corpus's gate path) — and the
    dup n-gram expansion is absent from its plan."""
    from irclogbot_spark.operators.repetition import repetition_stats
    from irclogbot_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = {
        r.doc_id: (r.n_top_grams, r.top2gram_frac)
        for r in repetition_stats(d).collect()
    }
    top = repetition_stats(d, families=("top",))
    assert top.columns == ["doc_id", "n_top_grams", "top2gram_frac"]
    got = {r.doc_id: (r.n_top_grams, r.top2gram_frac) for r in top.collect()}
    assert got == full


def test_repetition_rejects_bad_families(spark):
    """Invalid families fail loudly: duplicates (which would double
    n_top_grams), unknown names, and empty — explicit raise, not a
    vanishing-under-python-O assert (ADVICE r3)."""
    import pytest

    from irclogbot_spark.operators.repetition import repetition_stats

    d = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    for bad in [("top", "top"), ("bogus",), (), ("top", "dup", "dup")]:
        with pytest.raises(ValueError, match="families"):
            repetition_stats(d, families=bad)


def test_chunk_documents_windows_and_edges(spark):
    """operators/packing.chunk_documents: window grid, short final
    chunk, overlap reconstruction, empty/short-doc edges."""
    import pytest

    from irclogbot_spark.operators.packing import chunk_documents

    words = [f"w{i}" for i in range(10)]
    d = spark.createDataFrame(
        [(1, " ".join(words)), (2, ""), (3, "solo")], "doc_id long, text string"
    )
    out = [
        r.asDict()
        for r in chunk_documents(d, chunk=4, overlap=1)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    ]
    got = [(r["doc_id"], r["chunk_idx"], r["start_token"], r["n_tokens"], r["chunk_text"])
           for r in out]
    # step 3: starts 1,4,7,10; last window holds the single w9
    assert got == [
        (1, 0, 1, 4, "w0 w1 w2 w3"),
        (1, 1, 4, 4, "w3 w4 w5 w6"),
        (1, 2, 7, 4, "w6 w7 w8 w9"),
        (1, 3, 10, 1, "w9"),
        (3, 0, 1, 1, "solo"),
    ]  # doc 2 (empty) emits no rows
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(d, chunk=4, overlap=4)
