"""Ingest core — the reference pipeline as pure DataFrame transforms.

Each function is ``DataFrame -> DataFrame`` and works identically on
batch frames and Structured Streaming frames (no actions, no
collect): the operator chain of process_msg/record
(/root/reference/irclogbot.py:122-142,40-59) re-expressed so Catalyst
sees one declarative plan — the regex evaluates once per line,
filters run ahead of any shuffle, and the whole parse stage is a
single WholeStageCodegen span.

Operator map (SURVEY.md §2):
  F1 non_empty_lines      irclogbot.py:123-124
  F2 drop_ping            irclogbot.py:128-130 (control path is connector-internal)
  P1 parse_privmsg        irclogbot.py:24,131-136 (MSG_PAT, 5 groups)
  F3 drop_unmatched       irclogbot.py:131-132
  P3 normalize_action     irclogbot.py:137-138
  F4 sane_nicks           irclogbot.py:139-141
  P4 with_posted          irclogbot.py:41 / logbot_roundrobin.py:162
  H1 with_id              utils.py:125-136 (compat) / scale hash
  H2 dedup                logbot_roundrobin.py:50-54 (time-free key)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.functions.hashing import blake2b_id, scale_id

#: The parse operator — /root/reference/irclogbot.py:24 (same at
#: logbot_roundrobin.py:30). Group 1 nick, 2 user, 3 host, 4 channel,
#: 5 remark; groups 2-3 are discarded by the reference
#: (irclogbot.py:133-136) but retained here as cheap extras
#: (excluded from the id hash — SURVEY.md §1.1).
#:
#: The pattern itself is unanchored, but the reference applies it via
#: ``MSG_PAT.match()`` (irclogbot.py:131) which anchors at position 0
#: — a line with junk before the ':' prefix is NOT a message. Every
#: engine application prepends '^' (ANCHORED_MSG_PAT) to mirror that.
MSG_PAT = r":([^!]+)!~?([^@]+)@(\S+) PRIVMSG (\S+) :(.+)"

#: Python-re whitespace for str patterns: Unicode White_Space PLUS the
#: legacy information separators \x1c-\x1f. Java's default \s is
#: ASCII-only ([ \t\n\x0b\f\r]), so a host like 'h\x1fost' matches
#: Java \S+ but NOT Python's — and the reference's re.match would
#: drop the line. The engine pattern spells the class out so the
#: match is byte-identical to CPython's (property-tested against the
#: re module in tests/test_properties.py).
_PY_WS = "".join(
    chr(c)
    for c in (
        0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C,  # ASCII whitespace
        0x1C, 0x1D, 0x1E, 0x1F,  # information separators (Python-only)
        0x85, 0xA0, 0x1680,  # NEL, NBSP, ogham space
        *range(0x2000, 0x200B),  # en/em/etc spaces
        0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
    )
)
_PY_NONSPACE = "[^" + _PY_WS + "]"

#: the engine's executable form of MSG_PAT: anchored (reference uses
#: re.match) and with \S replaced by the Python-exact class above.
#: The ORACLE keeps the plain pattern (RE2 lacks \uXXXX escapes); the
#: synth corpus contains none of the divergent characters, so both
#: engines agree on every oracle-checked row.
ANCHORED_MSG_PAT = "^" + MSG_PAT.replace(r"\S", _PY_NONSPACE)

#: F4 bound — nicks of length >= 17 are mis-parsed server lines
#: (irclogbot.py:139-141).
MAX_NICK_LEN = 17

#: H2 dedup key — time deliberately excluded so redundant workers
#: converge on one id (logbot_roundrobin.py:50-54).
DEDUP_KEY = ["channel", "nick", "remark"]


def non_empty_lines(df: DataFrame, col: str = "value") -> DataFrame:
    """F1: drop blank lines after trim. The reference strips EXACTLY
    ' \\n\\r' then tests falsiness (irclogbot.py:118,123-124) — note
    tabs survive. Spark's bare trim() removes every char <= 0x20, so
    the exact-set TRIM(BOTH ... FROM ...) form is what keeps a
    leading-tab line byte-identical to the reference's."""
    trimmed = F.expr(f"trim(BOTH concat(' ', chr(10), chr(13)) FROM {col})")
    return df.withColumn(col, trimmed).filter(F.length(F.col(col)) > 0)


def drop_invalid_utf8(df: DataFrame, col: str = "value") -> DataFrame:
    """S2: cleanly drop lines that failed UTF-8 decode.

    The reference's except-branch skips the *current* message but then
    reprocesses the stale previous one (bug at irclogbot.py:112-119);
    the engine's documented deviation is a clean drop (SURVEY.md §2A
    S2). Spark's text source passes undecodable bytes through verbatim
    inside its UTF8String (it does NOT substitute U+FFFD — display
    does), so the exact predicate for 'this line failed UTF-8 decode'
    is the builtin byte-level validator.
    """
    return df.filter(F.expr(f"is_valid_utf8({col})"))


def drop_ping(df: DataFrame, col: str = "value") -> DataFrame:
    """F2: PING keepalives are control-plane, never recorded
    (irclogbot.py:128-130). Cheap substring test runs before the regex,
    preserving the reference's short-circuit ordering (SURVEY.md §4)."""
    return df.filter(~F.col(col).contains("PING :"))


def contains_any(col: Column | str, needles: list[str]) -> Column:
    """F5 data-plane analog of wait_for (irclogbot.py:145-157): true
    when the line contains any of the given substrings. The reference
    uses this to gate the NickServ handshake while still processing
    passing traffic; in a declarative plan the 'keep processing'
    half is free, and this predicate expresses the match half."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(False)
    for n in needles:
        out = out | c.contains(n)
    return out


def match_gate(df: DataFrame, col: str = "value") -> DataFrame:
    """F3+F4 as cheap RAW-line predicates, evaluated before the group
    projection so Catalyst's predicate pushdown cannot substitute the
    parse expression into per-group filters (measured: the pushed
    `nick != '' AND ...` form re-ran the regex ~5x per raw line).

    * F3 drop-unmatched == the anchored rlike itself: when
      ANCHORED_MSG_PAT matches, every group is >= 1 char, so the
      post-parse `nick/channel/remark != ''` checks are implied.
    * F4 nick-length: the nick spans position 2..first '!'
      (`:([^!]+)!...` anchored), so len(nick) = instr(value,'!') - 2
      — one byte scan instead of a regex group extraction.
    """
    v = F.col(col)
    return df.filter(
        v.rlike(ANCHORED_MSG_PAT) & (F.instr(v, "!") < F.lit(2 + MAX_NICK_LEN))
    )


def parse_privmsg(
    df: DataFrame,
    col: str = "value",
    keep_raw: bool = False,
    passthrough: list[str] | None = None,
    assume_matched: bool = False,
) -> DataFrame:
    """P1+P2: one regex, five groups, projected to named columns.

    Catalyst collapses the five regexp_extract calls into one
    codegen'd stage; column pruning drops whatever downstream doesn't
    read — the general form of the reference's parse-time projection
    (irclogbot.py:133-136).
    """
    v = F.col(col)
    if assume_matched:
        # ZERO regex executions here (round 3; was one regexp_replace
        # — still a full second regex pass, ~half the measured parse
        # cost on 2M lines). When ANCHORED_MSG_PAT has matched, every
        # group boundary is forced — the regex admits exactly one
        # decomposition:
        #   * nick  = [^!]+  -> everything before the FIRST '!';
        #   * '~?'  greedily eats one '~' after '!' unless the next
        #     char is '@' (then [^@]+ would be empty and the engine
        #     backtracks the '~' into user);
        #   * user  = [^@]+  -> up to the FIRST '@' after that;
        #   * host  = \S+ followed by literal ' ' -> up to the FIRST
        #     space after the '@' (\S+ can neither contain the space
        #     nor stop short of it: the following literal ' ' cannot
        #     match a non-space);
        #   * channel = \S+ after ' PRIVMSG ' -> same argument, up to
        #     the next space, which the match guarantees precedes ':';
        #   * remark = (.+) -> the rest of the line.
        # So post-gate, first-occurrence string arithmetic IS the
        # regex, at byte-scan cost. Property tests pin equivalence
        # against CPython re over adversarial corpora
        # (tests/test_properties.py).
        bang = F.instr(v, "!")
        after_bang = F.substring(v, bang + F.lit(1), 1)
        next_after = F.substring(v, bang + F.lit(2), 1)
        ustart = bang + F.lit(1) + F.when(
            (after_bang == "~") & (next_after != "@"), F.lit(1)
        ).otherwise(F.lit(0))
        out = df.select(
            *[F.col(p) for p in (passthrough or [])],
            *([v.alias("raw")] if keep_raw else []),
            v.alias("_v"),
            bang.alias("_bang"),
            ustart.alias("_us"),
        ).select(
            *[F.col(p) for p in (passthrough or [])],
            *([F.col("raw")] if keep_raw else []),
            "_v",
            "_bang",
            "_us",
            F.expr("locate('@', _v, _us)").alias("_at"),
        ).select(
            *[F.col(p) for p in (passthrough or [])],
            *([F.col("raw")] if keep_raw else []),
            "_v",
            "_bang",
            "_us",
            "_at",
            F.expr("locate(' ', _v, _at + 1)").alias("_sp1"),
        ).select(
            *[F.col(p) for p in (passthrough or [])],
            *([F.col("raw")] if keep_raw else []),
            "_v",
            "_bang",
            "_us",
            "_at",
            "_sp1",
            F.expr("locate(' ', _v, _sp1 + 9)").alias("_sp2"),
        ).select(
            *[F.col(p) for p in (passthrough or [])],
            *([F.col("raw")] if keep_raw else []),
            F.expr("substring(_v, 2, _bang - 2)").alias("nick"),
            F.expr("substring(_v, _us, _at - _us)").alias("user"),
            F.expr("substring(_v, _at + 1, _sp1 - _at - 1)").alias("host"),
            F.expr("substring(_v, _sp1 + 9, _sp2 - _sp1 - 9)").alias("channel"),
            F.expr("substring(_v, _sp2 + 2)").alias("remark"),
        )
        return out
    # Ungated path: one rlike + one regexp_replace rewriting the line
    # to its 5 groups joined by US (0x1F); non-matching lines yield
    # empty groups. split(limit=5) keeps any 0x1F inside the remark
    # intact; a 0x1F inside nick/user/host/channel would mis-split,
    # which IRC framing makes unreachable in practice.
    sep = "\x1f"
    packed = F.regexp_replace(v, ANCHORED_MSG_PAT, sep.join(f"${i}" for i in range(1, 6)))
    groups = F.when(v.rlike(ANCHORED_MSG_PAT), F.split(packed, sep, 5)).otherwise(
        F.array(*[F.lit("")] * 5)
    )
    out = df.select(
        *[F.col(p) for p in (passthrough or [])],
        *([v.alias("raw")] if keep_raw else []),
        groups.alias("_g"),
    ).select(
        *[F.col(p) for p in (passthrough or [])],
        *([F.col("raw")] if keep_raw else []),
        F.col("_g")[0].alias("nick"),
        F.col("_g")[1].alias("user"),
        F.col("_g")[2].alias("host"),
        F.col("_g")[3].alias("channel"),
        F.col("_g")[4].alias("remark"),
    )
    return out


def drop_unmatched(df: DataFrame) -> DataFrame:
    """F3: non-PRIVMSG lines (server notices, JOIN/QUIT noise) yield
    empty regex groups and are dropped (irclogbot.py:131-132)."""
    return df.filter((F.col("nick") != "") & (F.col("channel") != "") & (F.col("remark") != ""))


def normalize_action(df: DataFrame, col: str = "remark") -> DataFrame:
    """P3: CTCP ACTION -> '/me ' rewrite (irclogbot.py:137-138).

    The reference tests startswith('ACTION ') on the already-stripped
    line (the \\x01 CTCP delimiters are gone by then) and then runs
    ``remark.replace("ACTION ", "/me ")`` — which substitutes EVERY
    occurrence, not just the prefix ('ACTION waves ACTION again' ->
    '/me waves /me again'). Byte-exact parity matters here because the
    remark feeds the compat blake2b id (functions.hashing).
    """
    c = F.col(col)
    return df.withColumn(
        col,
        F.when(
            c.startswith("ACTION "),
            F.regexp_replace(c, F.lit(r"ACTION "), F.lit("/me ")),
        ).otherwise(c),
    )


def sane_nicks(df: DataFrame) -> DataFrame:
    """F4: len(nick) >= 17 means a mis-parsed server line — drop
    (irclogbot.py:139-141)."""
    return df.filter(F.length("nick") < MAX_NICK_LEN)


def with_posted(df: DataFrame, ts: Column | None = None) -> DataFrame:
    """P4: event-time captured at parse time, truncated to whole
    seconds (logbot_roundrobin.py:162 semantics — capture-at-parse, the
    roundrobin fix; irclogbot.py:41 for the truncation). Pass ``ts`` to
    use a data-borne event time (replay/tests); default is processing
    wall-clock like the reference."""
    src = ts if ts is not None else F.current_timestamp()
    # canonical posted type is TIMESTAMP_NTZ (naive UTC wall clock,
    # FIXTURES.md §A2) — date_trunc always returns LTZ, so cast back;
    # value-preserving because the engine pins the session to UTC
    return df.withColumn("posted", F.date_trunc("second", src).cast("timestamp_ntz"))


def with_id(df: DataFrame, compat: bool = False) -> DataFrame:
    """H1: content-hash id over the time-free dedup key (H2 scope).

    compat=False (default): JVM-side sha2-256 scale hash (see
    functions.hashing.scale_id). compat=True: byte-exact blake2b-8
    pandas UDF matching utils.py:125-136 — 16-hex ids identical to the
    reference's, for drop-in index compatibility.
    """
    if compat:
        return df.withColumn("id", blake2b_id(F.col("channel"), F.col("nick"), F.col("remark")))
    return df.withColumn("id", scale_id("channel", "nick", "remark"))


def dedup(df: DataFrame) -> DataFrame:
    """H2/H3 batch form: collapse duplicate deliveries on the
    time-free content key. In the reference this happens implicitly at
    the sink — ES PUT by content id overwrites (irclogbot.py:50-51);
    here it is an explicit operator so batch output is deterministic.
    Streaming uses watermarked dropDuplicates (streaming.pipeline)."""
    return df.dropDuplicates(DEDUP_KEY)


def parse_pipeline(
    raw: DataFrame,
    col: str = "value",
    ts_col: str | None = None,
    compat_id: bool = False,
    deduplicate: bool = False,
) -> DataFrame:
    """The full per-line operator chain of process_msg+record
    (irclogbot.py:122-142,40-45): F1 -> F2 -> P1/P2 -> F3 -> P3 -> F4
    -> P4 -> H1 [-> H2].

    ``ts_col`` names a column of ``raw`` to use as event time
    (replay/tests); default is processing wall-clock like the
    reference. Returns the canonical irclog frame:
    (channel, nick, posted, remark, id, user, host) — FIXTURES.md §A2.
    """
    df = non_empty_lines(raw, col)
    df = drop_invalid_utf8(df, col)
    df = drop_ping(df, col)
    # F3+F4 run as raw-line predicates (match_gate) so the group
    # projection below is the regex's ONLY evaluation site; the
    # post-parse drop_unmatched/sane_nicks operators remain for
    # callers filtering already-parsed frames
    df = match_gate(df, col)
    df = parse_privmsg(df, col, passthrough=[ts_col] if ts_col else None, assume_matched=True)
    df = normalize_action(df)
    df = with_posted(df, ts=F.col(ts_col) if ts_col else None)
    df = with_id(df, compat=compat_id)
    df = df.select("channel", "nick", "posted", "remark", "id", "user", "host")
    if deduplicate:
        df = dedup(df)
    return df
