"""Operator-level tests: MinHash vs exact Jaccard, SimHash, ANN
recall vs brute force, multimodal plumbing (SURVEY.md §5 items 3-4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irclogbot_spark.operators import dedup, multimodal, similarity
from irclogbot_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def _pairs(df):
    return {(r.d1, r.d2) for r in df.collect()}


def test_minhash_finds_all_high_jaccard_pairs(spark, docs):
    exact = _pairs(dedup.jaccard_pairs(docs, threshold=0.8))
    assert exact, "fixture should contain planted near-dups"
    mh = _pairs(dedup.minhash_neardup_pairs(docs, threshold=0.8))
    # verification step makes minhash results a subset of exact;
    # recall must be high (16 bands x 4 rows at j>=0.8 => ~1-1e-9)
    assert mh.issubset(exact)
    assert len(mh) >= 0.9 * len(exact), f"recall {len(mh)}/{len(exact)}"


def test_minhash_candidates_prune_search_space(spark, docs):
    n_docs = docs.count()
    n_cand = dedup.minhash_lsh_candidates(docs).count()
    assert n_cand < n_docs * (n_docs - 1) / 2 * 0.05, "LSH must prune >95% of pairs"


def test_simhash_is_deterministic_and_discriminative(spark, docs):
    a = dedup.simhash64("text")
    out1 = docs.select("doc_id", a.alias("s")).collect()
    out2 = docs.select("doc_id", a.alias("s")).collect()
    assert sorted(out1) == sorted(out2)
    assert len({r.s for r in out1}) > 0.9 * len(out1), "simhash should spread"


def test_simhash_near_identical_docs_have_close_hashes(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again ok"),
        (2, "the quick brown fox jumps over the lazy dog again and again yes"),
        (3, "completely different content about spark shuffle partitions here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.s for r in df.select("doc_id", dedup.simhash64("text").alias("s")).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(got[1], got[2]) < ham(got[1], got[3])
    assert ham(got[1], got[2]) < ham(got[2], got[3])


def test_neardup_components_label_propagation(spark):
    # chain 1-2-3 plus isolated pair 8-9: components {1,2,3} and {8,9}
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (8, 9)], "d1 long, d2 long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup.neardup_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}


def test_neardup_components_long_chain_exact(spark):
    # 40-hop path with the min id at the FAR end, ordered so plain
    # synchronous neighbor-min would need ~40 rounds: pointer doubling
    # + the convergence loop must still reach the exact transitive-
    # closure fixpoint (the alternating-key chaining scenario from the
    # round-6 advice — a >max_iter-hop chain must not mislabel).
    n = 41
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "d1 long, d2 long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.neardup_components(pairs, max_iter=8).collect()
    }
    assert got == {i: 1 for i in range(1, n + 1)}


def test_neardup_components_converges_early(spark):
    # a 2-node component is done after one round; the convergence
    # check must terminate the loop (not run out max_iter) and still
    # return the fixpoint even with an absurd max_iter
    pairs = spark.createDataFrame([(5, 7)], "d1 long, d2 long")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.neardup_components(pairs, max_iter=1000).collect()
    }
    assert got == {5: 5, 7: 5}


def test_neardup_components_fractional_ids_exact(spark):
    # round-8 advice regression: double ids whose values differ by
    # <0.5 would sum identically after the decimal(38,0) HALF_UP cast
    # (2.6 and 2.5 both round to 3), so the sum probe must NOT be
    # used — fractional numerics route to the anti-join change count
    # and still reach the exact per-component minimum.
    pairs = spark.createDataFrame(
        [(2.6, 2.5), (2.5, 2.4), (9.1, 9.05)], "d1 double, d2 double"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.neardup_components(pairs).collect()
    }
    assert got == {2.4: 2.4, 2.5: 2.4, 2.6: 2.4, 9.05: 9.05, 9.1: 9.05}


def test_dedup_corpus_end_to_end(spark):
    base = "the quick brown fox jumps over the lazy dog in the sunny meadow today"
    rows = [
        (1, base),
        (2, base),  # exact duplicate of 1
        (3, base + " ok"),  # near-dup of 1/2
        (4, "completely different text about spark shuffles and partitions at scale"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.kept, r.dedup_reason, r.keeper_id) for r in dedup.dedup_corpus(df).collect()}
    assert got[1] == (True, "keeper", 1)
    assert got[2] == (False, "exact_duplicate", 1)
    assert got[3] == (False, "near_duplicate", 1)
    assert got[4] == (True, "keeper", 4)


def test_exact_dedup_keeps_one_per_content(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in dedup.exact_dedup(df).collect())
    assert kept == [1, 3]


def test_ann_finds_planted_near_duplicates(spark, emb):
    """SRP-LSH's contract is near-dup retrieval (high-cosine pairs).
    This corpus' true top-5 neighbors sit at cosine ~0.3 (~72 deg,
    near-orthogonal) where no LSH both prunes and recalls — so plant
    near-identical queries (tiny deterministic perturbation) and
    require the twin at rank 1."""
    qs = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("query_id"),
        F.transform(F.col("embedding"), lambda x: x * 1.01 + F.lit(0.002)).alias(
            "embedding"
        ),
    )
    got = {
        r.query_id: r.vec_id
        for r in similarity.ann_topk(emb, qs, k=1, n_planes=8, probes=9).collect()
    }
    hits = sum(1 for qid, vid in got.items() if vid == qid - 10000)
    assert hits >= 9, f"planted-twin recall {hits}/10: {got}"


def test_ann_agrees_with_brute_force_on_neardups(spark, emb):
    qs = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("query_id"),
        F.transform(F.col("embedding"), lambda x: x * 1.01 + F.lit(0.002)).alias(
            "embedding"
        ),
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.knn_join(emb, qs, k=1).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in similarity.ann_topk(emb, qs, k=1, n_planes=8, probes=9).collect()
    }
    assert exact == approx


def test_ann_is_cheaper_than_brute_force(spark, emb):
    from irclogbot_spark.operators.similarity import as_double, random_planes, srp_bucket

    planes = random_planes(64, 8)
    sizes = (
        emb.select(srp_bucket(as_double("embedding"), planes).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in sizes)
    biggest = max(r["count"] for r in sizes)
    assert biggest < total * 0.25, "buckets must partition the corpus"


def test_simhash_table_equals_fold_form(spark, docs):
    """The explode+codegen-aggregate SimHash (the fast path) must be
    bit-identical to the pure-expression fold, including the all-zero
    fingerprint for token-less docs."""
    sample = docs.limit(50).union(
        docs.sparkSession.createDataFrame(
            [(999999, "", "und", "synthetic", 0)],
            "doc_id long, text string, lang string, source string, n_chars int",
        ).select(*docs.columns)
    )
    fold = {
        r.doc_id: r.sim
        for r in sample.select("doc_id", dedup.simhash64("text").alias("sim")).collect()
    }
    fast = {r.doc_id: r.sim for r in dedup.simhash_table(sample).collect()}
    assert fold == fast
    assert fast[999999] == 0


def test_ivf_finds_planted_near_duplicates(spark, emb):
    """IVF (spherical k-means cells) is the inverted-file alternative
    to SRP-LSH: same contract, train once, probe n_probe cells."""
    centroids = similarity.train_ivf_centroids(emb, n_cells=8, n_iter=3)
    assert len(centroids) == 8 and len(centroids[0]) == 64
    qs = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10000).alias("query_id"),
        F.transform(F.col("embedding"), lambda x: x * 1.01 + F.lit(0.002)).alias(
            "embedding"
        ),
    )
    got = {
        r.query_id: r.vec_id
        for r in similarity.ivf_topk(emb, qs, centroids, k=1, n_probe=2).collect()
    }
    hits = sum(1 for qid, vid in got.items() if vid == qid - 10000)
    # a planted twin's nearest cell is its original's cell, so even a
    # single-probe lookup should find it; n_probe=2 adds margin
    assert hits >= 9, f"planted-twin recall {hits}/10: {got}"


def test_minhash_portable_hash_is_equivalent_machinery(spark, docs):
    """The DuckDB-checkable hash mode (md5_hash31 + raw band keys)
    runs the SAME signature/banding/bucketing/verification operators:
    its verified pairs are a subset of exact Jaccard with the same
    recall bar as the default xxhash64 mode."""
    exact = _pairs(dedup.jaccard_pairs(docs, threshold=0.8))
    assert exact
    mh = _pairs(
        dedup.minhash_neardup_pairs(docs, threshold=0.8, hash_fn=dedup.md5_hash31)
    )
    assert mh.issubset(exact)
    assert len(mh) >= 0.9 * len(exact), f"recall {len(mh)}/{len(exact)}"


def test_ivf_trainer_matches_driver_replica_exactly(spark, emb):
    """The distributed trainer is a pure function of the corpus
    (integer-quantized accumulation): the driver-side replica that
    builds the oracle's centroid literals must agree BIT-FOR-BIT —
    any partitioning dependence left in the trainer breaks this."""
    import duckdb

    cents_spark = similarity.train_ivf_centroids(
        emb.repartition(7), n_cells=8, n_iter=3
    )
    rows = duckdb.sql(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) "
        f"FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    cents_local = similarity.train_ivf_centroids_local(
        [(r[0], list(r[1])) for r in rows], n_cells=8, n_iter=3
    )
    assert cents_spark == cents_local


def test_ivf_cells_partition_the_corpus(spark, emb):
    centroids = similarity.train_ivf_centroids(emb, n_cells=8, n_iter=3)
    from irclogbot_spark.operators.similarity import _argmax_cell, _cell_dots, as_double

    sizes = (
        emb.select(_cell_dots(as_double("embedding"), centroids).alias("dots"))
        .select(_argmax_cell(F.col("dots")).alias("cell"))
        .groupBy("cell")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in sizes)
    biggest = max(r["count"] for r in sizes)
    assert len(sizes) >= 4, "training collapsed to too few live cells"
    assert biggest < total * 0.6, "cells must partition the corpus"


def test_cosine_neardup_finds_planted_twins_only(spark, emb):
    base = emb.select("vec_id", similarity.as_double("embedding").alias("v"))
    planted = base.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 50000).alias("vec_id"),
        F.transform(F.col("v"), lambda x: x * 1.001 + F.lit(0.001)).alias("v"),
    )
    pairs = similarity.cosine_neardup_pairs(
        base.unionByName(planted), threshold=0.95, vec_col="v"
    ).collect()
    got = {(r.d1, r.d2) for r in pairs}
    assert got == {(i, i + 50000) for i in range(5)}
    assert all(r.cosine > 0.999 for r in pairs)


def test_multimodal_decode_plumbing(spark, docs):
    media = multimodal.synthesize_media(docs)
    out = multimodal.decode_images(media, n_features=4)
    rows = out.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert 16 <= r.width < 80 and 16 <= r.height < 80 and r.n_channels == 3
    assert len(r.feature) == 4 and all(isinstance(x, float) for x in r.feature)


def test_multimodal_raise_stub_marks_missing_codec(spark, docs):
    media = multimodal.synthesize_media(docs.limit(2))
    out = multimodal.decode_images(media, decode_stub="raise")
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        out.collect()


def test_bmp_codec_round_trip_and_padding():
    """Pure-stdlib BMP codec golden check: encode->decode is the
    identity on pixels for widths exercising every 4-byte row-padding
    residue, and decode handles top-down (negative height) BMPs."""
    import struct

    for width in (4, 5, 6, 7):  # strides pad by 0,1,2,3 bytes
        height = 3
        rgb = bytes((i * 31) % 256 for i in range(width * height * 3))
        payload = multimodal.encode_bmp(width, height, rgb)
        assert payload[:2] == b"BM"
        w, h, c, pix = multimodal.decode_bmp(payload)
        assert (w, h, c) == (width, height, 3)
        assert pix == rgb
    # top-down variant: flip the height sign and the row order
    width, height = 5, 2
    rgb = bytes((i * 17) % 256 for i in range(width * height * 3))
    payload = bytearray(multimodal.encode_bmp(width, height, rgb))
    stride = width * 3 + ((-width * 3) % 4)
    rows = [payload[54 + y * stride : 54 + (y + 1) * stride] for y in range(height)]
    payload[54:] = b"".join(reversed(rows))
    payload[22:26] = struct.pack("<i", -height)
    w, h, c, pix = multimodal.decode_bmp(bytes(payload))
    assert (w, h, c) == (width, height, 3)
    assert pix == rgb


def test_bmp_codec_rejects_unsupported_variants():
    with pytest.raises(ValueError, match="not a BMP"):
        multimodal.decode_bmp(b"\xff\xd8\xff\xe0" + b"\x00" * 64)  # JPEG magic
    good = multimodal.encode_bmp(2, 2, bytes(12))
    bad = bytearray(good)
    bad[28] = 8  # bitcount 8 -> palette BMP, the stub seam's job
    with pytest.raises(ValueError, match="24-bit"):
        multimodal.decode_bmp(bytes(bad))


def test_ppm_codec_round_trip_comments_and_truncation():
    rgb = bytes((i * 7) % 256 for i in range(6 * 4 * 3))
    payload = multimodal.encode_ppm(6, 4, rgb)
    assert multimodal.decode_ppm(payload) == (6, 4, 3, rgb)
    commented = b"P6\n# a comment\n 6\t4 # trailing\n255\n" + rgb
    assert multimodal.decode_ppm(commented) == (6, 4, 3, rgb)
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_ppm(payload[:-1])


def _png_with_filters(width, height, ch, pixels, filters):
    """Build a PNG whose scanlines use the GIVEN filter types, by
    forward-filtering known pixels in the test (the decoder must
    invert every one of them)."""
    import struct as st
    import zlib

    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        f = filters[y % len(filters)]
        line = pixels[y * stride : (y + 1) * stride]
        enc = bytearray(line)
        if f == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (enc[i] - line[i - ch]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                enc[i] = (enc[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                enc[i] = (enc[i] - multimodal._paeth(a, prev[i], c)) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = line

    def chunk(tag, data):
        return (
            st.pack(">I", len(data)) + tag + data
            + st.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = st.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def test_png_codec_round_trip_all_color_types():
    for color_type, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        w, h = 7, 5
        pix = bytes((i * 23 + ch) % 256 for i in range(w * h * ch))
        payload = multimodal.encode_png(w, h, pix, color_type=color_type)
        assert multimodal.decode_png(payload) == (w, h, ch, pix)


def test_png_decoder_inverts_every_filter_type():
    w, h, ch = 6, 10, 3
    pix = bytes((i * 37 + 11) % 256 for i in range(w * h * ch))
    payload = _png_with_filters(w, h, ch, pix, filters=[0, 1, 2, 3, 4])
    assert multimodal.decode_png(payload) == (w, h, ch, pix)


def test_png_codec_rejects_corruption_and_variants():
    payload = bytearray(multimodal.encode_png(3, 3, bytes(27)))
    payload[40] ^= 0xFF  # flip a byte inside IDAT -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_png(bytes(payload))
    good = bytearray(multimodal.encode_png(3, 3, bytes(27)))
    good[24] = 16  # bit depth 16 in IHDR
    # CRC now mismatches too, so rebuild the IHDR chunk properly
    import struct as st
    import zlib as zl

    ihdr = st.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)
    rebuilt = (
        b"\x89PNG\r\n\x1a\n"
        + st.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + st.pack(">I", zl.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + bytes(good[8 + 25 :])
    )
    with pytest.raises(ValueError, match="8-bit"):
        multimodal.decode_png(rebuilt)


def test_decode_images_real_png_through_arrow_seam(spark, docs):
    """PNG rows decode for real through mapInPandas (mixed with the
    bmp fixture path elsewhere): known 2x2 RGB image, exact features."""
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    payload = multimodal.encode_png(2, 2, pix, color_type=2)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "png", "t://1")],
        schema=multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.decode_images(
        media, n_features=3, decode_stub="raise"
    ).collect()[0]
    assert (row.width, row.height, row.n_channels) == (2, 2, 3)
    for ch in range(3):
        vals = pix[ch::3]
        assert abs(row.feature[ch] - sum(vals) / (len(vals) * 255.0)) < 1e-6


def test_decode_images_real_bmp_end_to_end(spark, docs):
    """The real-codec path through the Arrow seam: BMP payloads built
    by synthesize_bmp_media decode to the geometry the fixture
    encoded, with exact per-channel-mean features — under
    decode_stub='raise', proving no stub fallback fires for real
    formats."""
    limited = docs.limit(8)
    media = multimodal.synthesize_bmp_media(limited)
    out = {
        r.asset_id: r
        for r in multimodal.decode_images(
            media, n_features=3, decode_stub="raise"
        ).collect()
    }
    for row in limited.collect():
        n = len(row.text.encode("utf-8"))
        w, h = 4 + n % 13, 3 + n % 7
        got = out[row.doc_id]
        assert (got.width, got.height, got.n_channels) == (w, h, 3)
        need = w * h * 3
        pix = (row.text.encode("utf-8") * (need // n + 1))[:need]
        for ch in range(3):
            vals = pix[ch::3]
            expect = float(sum(vals)) / (len(vals) * 255.0)
            assert abs(got.feature[ch] - expect) < 1e-6


def test_resize_nearest_golden_and_real_bmp_round_trip(spark):
    # 2x2 RGB -> 4x4 nearest neighbor: each source pixel becomes a
    # 2x2 block (integer mapping sx = x*2//4)
    px = [b"\x01\x02\x03", b"\x04\x05\x06", b"\x07\x08\x09", b"\x0a\x0b\x0c"]
    src = b"".join(px)
    out = multimodal._resize_nearest(2, 2, 3, src, 4, 4)
    rows = [out[y * 12 : (y + 1) * 12] for y in range(4)]
    assert rows[0] == rows[1] == px[0] * 2 + px[1] * 2
    assert rows[2] == rows[3] == px[2] * 2 + px[3] * 2
    # real path through the seam: decode -> resample -> re-encode,
    # and the re-encoded payload must itself parse
    payload = multimodal.encode_bmp(2, 2, src)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "bmp", "t://1")],
        schema=multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.resize_images(
        media, width=4, height=4, decode_stub="raise"
    ).collect()[0]
    assert (r.src_width, r.src_height, r.width, r.height) == (2, 2, 4, 4)
    assert multimodal.decode_bmp(bytes(r.payload)) == (4, 4, 3, out)
    # png keeps its color type through the resample
    gray = multimodal.encode_png(2, 1, b"\x40\xc0", color_type=0)
    media_g = spark.createDataFrame(
        [(2, "image", bytearray(gray), "png", "t://2")],
        schema=multimodal.MEDIA_SCHEMA,
    )
    g = multimodal.resize_images(
        media_g, width=4, height=2, decode_stub="raise"
    ).collect()[0]
    assert multimodal.decode_png(bytes(g.payload)) == (
        4, 2, 1, b"\x40\x40\xc0\xc0" * 2
    )


def test_multimodal_resize_plumbing(spark, docs):
    media = multimodal.synthesize_media(docs.limit(20))
    out = multimodal.resize_images(media, width=64, height=64).collect()
    assert len(out) == 20
    for r in out:
        assert (r.width, r.height) == (64, 64)
        assert len(r.payload) == 64 * 64 // 64  # stub geometry contract
        assert r.media_type == "image" and r.source_uri.startswith("synthetic://")
    # no shuffle: the map stage preserves partitioning
    plan = multimodal.resize_images(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_wav_codec_round_trip_and_chunk_walk():
    import struct as st

    pcm = bytes((i * 13) % 256 for i in range(100 * 2 * 2))  # 100 stereo frames
    payload = multimodal.encode_wav(16000, 2, pcm)
    assert multimodal.decode_wav(payload) == (16000, 2, 100, pcm)
    # foreign chunks (LIST with odd size -> pad byte) must be skipped
    lst = b"LIST" + st.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:12] + lst + payload[12:]
    spliced = b"RIFF" + st.pack("<I", len(spliced) - 8) + spliced[8:]
    assert multimodal.decode_wav(spliced) == (16000, 2, 100, pcm)
    with pytest.raises(ValueError, match="not a RIFF"):
        multimodal.decode_wav(b"OggS" + bytes(40))
    # 8-bit PCM -> the library seam's job
    bad = bytearray(payload)
    st.pack_into("<H", bad, 34, 8)
    with pytest.raises(ValueError, match="16-bit"):
        multimodal.decode_wav(bytes(bad))


def test_extract_audio_features_real_wav_end_to_end(spark, docs):
    """WAV rows decode for real through the Arrow seam: known stereo
    signal, exact per-channel mean-|amplitude| features."""
    import array

    left = [1000, -2000, 3000, -4000]
    right = [0, 16384, -16384, 32767]
    inter = array.array("h")
    for l_s, r_s in zip(left, right):
        inter.extend([l_s, r_s])
    payload = multimodal.encode_wav(8000, 2, inter.tobytes())
    media = spark.createDataFrame(
        [(7, "audio", bytearray(payload), "wav", "t://7")],
        schema=multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.extract_audio_features(
        media, n_features=2, decode_stub="raise"
    ).collect()[0]
    assert (row.sample_rate, row.n_frames, row.n_channels) == (8000, 4, 2)
    assert abs(row.duration_s - 4 / 8000.0) < 1e-9
    for ch, sig in enumerate((left, right)):
        expect = sum(abs(s) for s in sig) / (len(sig) * 32768.0)
        assert abs(row.feature[ch] - expect) < 1e-6


def test_multimodal_audio_features_plumbing(spark, docs):
    media = multimodal.synthesize_media(docs.limit(10)).withColumn(
        "media_type", F.lit("audio")
    )
    out = multimodal.extract_audio_features(media, n_features=4).collect()
    assert len(out) == 10
    r = out[0]
    assert r.sample_rate == 16000 and r.duration_s > 0
    assert len(r.feature) == 4 and all(0.0 <= x <= 1.0 for x in r.feature)


def test_frame_sample_plan(spark, docs):
    media = multimodal.synthesize_media(docs.limit(5)).withColumn(
        "media_type", F.lit("video")
    )
    plan = multimodal.frame_sample_plan(media, every_n_seconds=5)
    rows = plan.collect()
    assert len(rows) >= 5
    assert all(r.offset_s % 5 == 0 for r in rows)


def test_bucket_pairs_cap_drops_degenerate_bucket_only(spark):
    """VERDICT r3 #8: a degenerate LSH bucket (hash pathology holding
    far more docs than max_bucket) is dropped WITHOUT stalling the
    stage or disturbing healthy buckets — pair fan-out stays bounded
    by max_bucket^2, the skew guard's whole point."""
    from irclogbot_spark.operators.dedup import _bucket_pairs

    rows = [(i, "degenerate") for i in range(200)] + [
        (1000, "healthy"),
        (1001, "healthy"),
        (2000, "solo"),
    ]
    keyed = spark.createDataFrame(rows, "doc_id long, band_key string")
    got = {
        (r.d1, r.d2)
        for r in _bucket_pairs(keyed, "doc_id", ["band_key"], max_bucket=50).collect()
    }
    # the 200-doc bucket would have emitted 19,900 pairs; the cap
    # removes ALL of them and keeps the healthy bucket's single pair
    assert got == {(1000, 1001)}


def test_keep_best_dedup_prefers_higher_score(spark):
    """keep_best_dedup: the keeper is the highest-scoring group
    member even when it has the LARGEST id (where keep-first would
    pick the smallest); ties fall back to the smallest id; singleton
    groups are their own keeper."""
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog in the sunny meadow today"
    rows = [
        (1, base),
        (2, base),          # exact duplicate of 1
        (3, base + " ok"),  # near-dup of 1/2
        (4, "completely different text about spark shuffles and partitions at scale"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # score favors doc 3 (the longest member of the group)
    score = F.length("text").cast("double")
    got = {
        r.doc_id: (r.kept, r.keeper_id, r.group_id)
        for r in dedup.keep_best_dedup(df, score).collect()
    }
    assert got[3] == (True, 3, 1)   # highest score wins despite largest id
    assert got[1] == (False, 3, 1)
    assert got[2] == (False, 3, 1)
    assert got[4] == (True, 4, 4)   # singleton
    # tie on score (docs 1 and 2 identical): smallest id keeps
    tie = {
        r.doc_id: (r.kept, r.keeper_id)
        for r in dedup.keep_best_dedup(
            df.filter(F.col("doc_id") < 3), F.lit(1.0)
        ).collect()
    }
    assert tie[1] == (True, 1) and tie[2] == (False, 1)


def test_rrf_fuse_both_lists_beat_single_list(spark):
    """operators/hybrid.py rrf_fuse: a doc ranked in BOTH lists
    outranks a doc ranked first in only one (1/61+1/62 > 1/61);
    single-list docs keep a NULL rank on the other side."""
    from irclogbot_spark.operators.hybrid import rrf_fuse

    t = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, text_rank long")
    v = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, vec_rank long")
    out = rrf_fuse(t, v, k=10).collect()
    assert [r.doc_id for r in out] == [20, 10, 30]
    by_id = {r.doc_id: r for r in out}
    assert by_id[20].rrf_score == 1.0 / 62 + 1.0 / 61
    assert by_id[10].vec_rank is None and by_id[30].text_rank is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rrf_fuse(t, v, k=0)


def test_remove_duplicate_spans_cuts_non_owner_occurrences(spark):
    """remove_duplicate_spans: a span shared with a lower-id doc is
    cut from the higher-id doc only; the owner keeps every copy
    (including within-doc repeats); docs shorter than n and disjoint
    docs pass through unchanged."""
    from irclogbot_spark.operators.crossdup import remove_duplicate_spans

    span = "alpha beta gamma delta"  # n=4 span
    rows = [
        (1, f"{span} tail one"),                 # owner
        (2, f"head {span} tail two"),            # non-owner: span cut
        (3, f"{span} middle {span}"),            # owner repeats survive? no - doc 1 owns
        (4, "totally unrelated words here now"),
        (5, "shorty"),                           # < n tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_duplicate_spans(df, n=4).collect()}
    assert got[1].text_clean == f"{span} tail one" and got[1].n_removed == 0
    # doc 2 shares pos-1 "alpha beta gamma delta" AND the overlapping
    # pos-2 "beta gamma delta tail" with doc 1 -> tokens 1..5 cut
    assert got[2].text_clean == "head two" and got[2].n_removed == 5
    # doc 3: BOTH its copies of the span are owned by doc 1 -> both cut
    assert got[3].text_clean == "middle" and got[3].n_removed == 8
    assert got[4].n_removed == 0 and got[4].text_clean == rows[3][1]
    assert got[5].text_clean == "shorty" and got[5].n_tokens == 1


def test_bm25_indexed_matches_scan_bit_exact(spark):
    """functions/text.py bm25_rank_indexed: probing the materialized
    postings/doclens index reproduces bm25_rank's corpus-scan scores
    BIT-FOR-BIT (integer avgdl, term-order score additions) — the
    indexed form is a physical change only."""
    from irclogbot_spark.functions.text import (
        bm25_rank,
        bm25_rank_indexed,
        build_text_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    terms = ["query", "window", "scan"]
    postings, doclens = build_text_index(docs)
    # enough hit docs that the scan form's top-k has no zero-score rows
    n_hits = postings.filter(F.col("term").isin(terms)).select("doc_id").distinct().count()
    assert n_hits >= 10
    scan = [(r.doc_id, r.score) for r in bm25_rank(docs, terms, k=10).collect()]
    indexed = [
        (r.doc_id, r.score)
        for r in bm25_rank_indexed(postings, doclens, terms, k=10).collect()
    ]
    assert scan == indexed  # exact doubles, same order


def test_hybrid_indexed_exhaustive_equals_exact_scan(spark):
    """operators/hybrid.py hybrid_search_indexed: with exhaustive ANN
    parameters (probe every cell, rerank the whole corpus) the
    inverted-index BM25 arm + IVF-PQ arm fuse to EXACTLY the
    exact-scan hybrid_search result; with production parameters the
    fused top-k stays mostly aligned (recall-bounded)."""
    from irclogbot_spark.functions.text import build_text_index
    from irclogbot_spark.operators.hybrid import hybrid_search, hybrid_search_indexed
    from irclogbot_spark.operators.pq import encode_ivfpq, train_pq_codebooks
    from irclogbot_spark.operators.similarity import train_ivf_centroids

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = train_ivf_centroids(emb, n_cells=8, n_iter=2)
    books = train_pq_codebooks(emb, n_sub=8, n_codes=16, n_iter=2)
    idx = encode_ivfpq(emb, cents, books).localCheckpoint(eager=True)
    postings, doclens = build_text_index(docs)
    terms = ["query", "window", "scan"]
    qid = 7

    exact = [
        (r.doc_id, r.text_rank, r.vec_rank, r.rrf_score)
        for r in hybrid_search(docs, emb, terms, qid, k=10, r=10).collect()
    ]
    exhaustive = [
        (r.doc_id, r.text_rank, r.vec_rank, r.rrf_score)
        for r in hybrid_search_indexed(
            postings, doclens, idx, terms, qid, cents, books,
            k=10, r=10, n_probe=8, rerank=500,
        ).collect()
    ]
    assert exact == exhaustive

    prod = hybrid_search_indexed(
        postings, doclens, idx, terms, qid, cents, books,
        k=10, r=10, n_probe=4, rerank=20,
    ).collect()
    assert len(prod) == 10
    overlap = {r.doc_id for r in prod} & {t[0] for t in exact}
    assert len(overlap) >= 5, sorted(overlap)


def test_wav_rejects_zero_sample_rate():
    import struct as st

    payload = bytearray(multimodal.encode_wav(16000, 1, bytes(8)))
    st.pack_into("<I", payload, 24, 0)  # sample_rate = 0 in fmt
    with pytest.raises(ValueError, match="sample rate"):
        multimodal.decode_wav(bytes(payload))


def test_multikey_linkage_links_across_key_families(spark):
    """A-B share key family 'u' (url), B-C share family 'e' (email):
    one entity spanning both hops; D shares nothing and stays out."""
    rows = [
        (1, "u1", "e1"),
        (2, "u1", "e2"),
        (3, "u9", "e2"),
        (4, "u4", "e4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, email string")
    out = dedup.multikey_linkage(
        df, {"u": F.col("url"), "e": F.col("email")}
    )
    got = {r.doc_id: (r.entity_id, r.n_members) for r in out.collect()}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3)}


def test_multikey_linkage_null_keys_never_block(spark):
    rows = [(1, None), (2, None), (3, "k")]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    out = dedup.multikey_linkage(df, {"k": F.col("k")})
    assert out.count() == 0


def test_multikey_linkage_partitioning_invariant_and_validates(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(30)], "doc_id long, g string"
    )
    a = sorted(map(tuple, dedup.multikey_linkage(df, {"g": F.col("g")}).collect()))
    b = sorted(
        map(
            tuple,
            dedup.multikey_linkage(
                df.repartition(7), {"g": F.col("g")}
            ).collect(),
        )
    )
    assert a == b and len(a) == 30
    with pytest.raises(ValueError):
        dedup.multikey_linkage(df, {})


def test_prefix_filter_join_complete_vs_exact_jaccard(spark):
    """Recall-1 check against jaccard_pairs (the quadratic form) on a
    corpus with planted near-dups at several overlap levels."""
    words = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(20):
        toks = words[d : d + 25]
        rows.append((d, " ".join(toks)))
        # planted: drop the last token (high overlap)
        rows.append((100 + d, " ".join(toks[:-1])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.d1, r.d2)
        for r in dedup.prefix_filter_pairs(df, t_num=4, t_den=5).collect()
    }
    want = {
        (r.d1, r.d2)
        for r in dedup.jaccard_pairs(df, threshold=0.8).collect()
    }
    assert got == want and len(want) > 0


def test_prefix_filter_join_integer_threshold_boundary(spark):
    # A: 9 tokens -> 5 shingles; B: A's first 8 tokens -> 4 shingles,
    # all shared. inter=4, union=5 -> J exactly 4/5: the integer
    # compare 5*4 >= 4*5 must KEEP the boundary pair at 800 milli.
    a = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    b = "t1 t2 t3 t4 t5 t6 t7 t8"
    # C: one token fewer again -> inter=3, union=5 vs A: J=0.6, out
    c = "t1 t2 t3 t4 t5 t6 t7"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    got = {
        (r.d1, r.d2): (r.n_common, r.n_union, r.jaccard_milli)
        for r in dedup.prefix_filter_pairs(df).collect()
    }
    # (2,3): inter=3, union=4 -> 0.75 < 0.8, excluded; (1,3): 0.6, out
    assert got == {(1, 2): (4, 5, 800)}


def test_prefix_filter_length_filter_inrow(spark):
    """VERDICT r8 wrong #2: the PPJoin length filter now runs IN-ROW
    inside the bucket pair lambda (zero extra joins). It must (a)
    demonstrably prune candidates on a heterogeneous-length corpus,
    (b) stay exact (filtered and unfiltered twins verify to the same
    pairs, both equal to the quadratic oracle), and (c) add no join
    on the size columns to the plan. Fixture (n=1 token sets): rare
    token r0 is shared ONLY by a 30-token doc and a 6-token doc, so
    r0 sits in BOTH prefixes -> a size-incompatible candidate that
    only the length filter can kill before the verify join."""
    common = [f"c{i}" for i in range(25)]
    rows = [
        (1, " ".join(common + ["r0", "r1", "r2", "r3", "r4"])),   # A
        (2, " ".join(common + ["r1", "r2", "r3", "r4"])),          # near-dup of A
        (3, " ".join(["r0"] + common[:5])),                        # short, shares r0
        (4, " ".join(common + [f"u1{i}" for i in range(5)])),      # df ballast
        (5, " ".join(common + [f"u2{i}" for i in range(5)])),      # df ballast
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # positional_filter=False both sides: this test isolates the
    # LENGTH filter (the positional filter would kill (1, 3) too)
    _, cand_on = dedup._prefix_filter_candidates(
        df, "doc_id", "text", 1, 4, 5, True, False
    )
    _, cand_off = dedup._prefix_filter_candidates(
        df, "doc_id", "text", 1, 4, 5, False, False
    )
    on = {(r.d1, r.d2) for r in cand_on.collect()}
    off = {(r.d1, r.d2) for r in cand_off.collect()}
    assert (1, 3) in off and (1, 3) not in on  # the filter fired
    assert on < off
    want = {
        (r.d1, r.d2) for r in dedup.jaccard_pairs(df, n=1, threshold=0.8).collect()
    }
    assert want == {(1, 2)}
    got_on = {
        (r.d1, r.d2) for r in dedup.prefix_filter_pairs(df, n=1, t_num=4, t_den=5).collect()
    }
    got_off = {
        (r.d1, r.d2)
        for r in dedup.prefix_filter_pairs(
            df, n=1, t_num=4, t_den=5, length_filter=False
        ).collect()
    }
    assert got_on == want and got_off == want
    # the filter adds ZERO joins: sizes ride the bucket structs, so
    # the filtered plan has exactly as many Join nodes as the
    # unfiltered twin (the round-8 form added two (id, m) joins)
    def n_joins(frame):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        return sum(1 for ln in plan.splitlines() if "Join" in ln)

    assert n_joins(dedup.prefix_filter_pairs(df)) == n_joins(
        dedup.prefix_filter_pairs(df, length_filter=False)
    )


def test_prefix_filter_join_validates(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.prefix_filter_pairs(df, t_num=6, t_den=5)


def test_backoff_surprisal_matches_python_reference(spark):
    """Engine scoring against a pure-Python stupid-backoff replica on
    a toy corpus (tables trained on the same corpus)."""
    import math

    from irclogbot_spark.operators.lm import (
        BACKOFF_PENALTY_MILLI,
        backoff_surprisal,
        surprisal_tables,
        train_backoff_costs,
    )

    rows = [
        (1, "a b a b c"),
        (2, "a b x"),
        (3, "q"),
        (4, "z z z z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    big, uni, n2, n1 = surprisal_tables(df, bigram_k=3, unigram_k=3)
    bc, uc, unk = train_backoff_costs(big, uni, n2, n1)
    got = {
        r.doc_id: (r.n_grams, r.cost_milli, r.avg_cost_milli)
        for r in backoff_surprisal(df, bc, uc, unk).collect()
    }

    def score(text):
        toks = text.split()
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        total = 0
        for g in grams:
            if g in bc:
                total += bc[g]
            else:
                total += BACKOFF_PENALTY_MILLI + uc.get(g.split()[1], unk)
        n = len(grams)
        return (n, total, total // n if n else 0)

    assert got == {i: score(t) for i, t in rows}
    assert got[3] == (0, 0, 0)  # single-token doc keeps a zero row


def test_backoff_cost_tables_quantization(spark):
    import math

    from irclogbot_spark.operators.lm import train_backoff_costs

    bc, uc, unk = train_backoff_costs([("a b", 4)], [("a", 8), ("q", 2)], 16, 10)
    assert bc["a b"] == int(math.floor(1000 * math.log(16 / 4) + 0.5))
    assert uc["q"] == int(math.floor(1000 * math.log(10 / 2) + 0.5))
    assert unk == max(uc.values()) + 1000
    with pytest.raises(ValueError):
        train_backoff_costs([], [("a", 1)], 1, 1)


def test_trgm_search_exact_vs_bruteforce_and_fallback(spark):
    from pyspark.sql import functions as F

    from irclogbot_spark.operators import trgm

    rows = [
        (1, "the quick brown fox"),
        (2, "quick silver"),
        (3, "a qu ick break"),        # has 'qu' but not 'quick'
        (4, "brown paper, quick fix"),
        (5, "nothing relevant here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = trgm.trgm_search(df, ["quick", "own", "qu"])
    got = {(r.pattern, r.doc_id) for r in out.collect()}
    brute = {
        (p, i) for p in ["quick", "own", "qu"] for i, t in rows if p in t
    }
    assert got == brute
    # the 2-char pattern really matched via the fallback arm (doc 3
    # has 'qu' but would produce no trigram candidates)
    assert ("qu", 3) in got


def test_trgm_index_is_reusable_and_text_free(spark):
    from irclogbot_spark.operators import trgm

    df = spark.createDataFrame(
        [(1, "abcd"), (2, "bcde")], "doc_id long, text string"
    )
    idx = trgm.trgm_index(df)
    assert set(idx.columns) == {"doc_id", "tri"}
    got = {(r.doc_id, r.tri) for r in idx.collect()}
    assert got == {(1, "abc"), (1, "bcd"), (2, "bcd"), (2, "cde")}
    # passing the prebuilt index gives the same answer
    out = trgm.trgm_search(df, ["bcd"], index=idx)
    assert {(r.pattern, r.doc_id) for r in out.collect()} == {("bcd", 1), ("bcd", 2)}


def test_trgm_persisted_index_partition_pruned(spark, tmp_path):
    # round-8: the docstring's "partition-prunable if written
    # bucketed" claim, demonstrated — the persisted posting index is
    # partitioned by crc32(tri) % n_buckets, the probe filters on
    # literal bucket constants, and the scan plan shows a non-empty
    # PartitionFilters (storage reads only the probed directories).
    from irclogbot_spark.operators import trgm

    rows = [
        (1, "the quick brown fox"),
        (2, "quick silver"),
        (3, "a qu ick break"),
        (4, "brown paper, quick fix"),
        (5, "nothing relevant here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "trgm_idx")
    trgm.write_trgm_index(df, path, n_buckets=16)
    idx, n_buckets = trgm.read_trgm_index(spark, path)
    assert n_buckets == 16

    out = trgm.trgm_search(
        df, ["quick", "own"], index=idx, index_buckets=n_buckets
    )
    got = {(r.pattern, r.doc_id) for r in out.collect()}
    brute = {(p, i) for p in ["quick", "own"] for i, t in rows if p in t}
    assert got == brute

    # the python bucket function is bit-identical to Spark's crc32
    from pyspark.sql import functions as F

    sp = {
        r.tri: r.b
        for r in idx.select(
            "tri",
            F.pmod(F.crc32(F.encode("tri", "UTF-8")), F.lit(16)).alias("b"),
        ).collect()
    }
    assert all(trgm.py_tri_bucket(t, 16) == b for t, b in sp.items())

    # plan shape: the probe's file scan prunes on tri_bkt
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "tri_bkt" in pf and pf.strip(), pf


def test_prefix_filter_positional_filter_inrow(spark):
    """The PPJoin POSITIONAL filter (round 9) must (a) prune a
    candidate the length filter cannot touch (equal sizes), (b) stay
    exact (on/off twins verify to the same pairs, equal to the
    quadratic oracle). Fixture (n=1 token sets, t=4/5, m=20 both):
    docs 11/12 share rare r0 plus 15 high-df ballast tokens
    (J=16/24 < 0.8 — a true negative). Their four unique df=1 tokens
    outrank r0, pushing it to prefix position 4 (0-based) on both
    sides, so ubound = 1 + min(15, 15) = 16 and the integer test
    9*16 >= 4*40 fails — the pair dies in-row before the distinct
    and before any array ships; with positional_filter=False it
    reaches the verify join and dies there instead."""
    common = [f"c{i}" for i in range(15)]
    rows = [
        (11, " ".join([f"a{i}" for i in range(4)] + ["r0"] + common)),
        (12, " ".join([f"b{i}" for i in range(4)] + ["r0"] + common)),
        # ballast raising the common tokens' df above r0's 2
        (13, " ".join(common + [f"u3{i}" for i in range(5)])),
        (14, " ".join(common + [f"u4{i}" for i in range(5)])),
        (15, " ".join(common + [f"u5{i}" for i in range(4)] + ["z9"])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _, cand_on = dedup._prefix_filter_candidates(
        df, "doc_id", "text", 1, 4, 5, True, True
    )
    _, cand_off = dedup._prefix_filter_candidates(
        df, "doc_id", "text", 1, 4, 5, True, False
    )
    on = {(r.d1, r.d2) for r in cand_on.collect()}
    off = {(r.d1, r.d2) for r in cand_off.collect()}
    assert (11, 12) in off and (11, 12) not in on  # positional fired
    assert on < off
    want = {
        (r.d1, r.d2)
        for r in dedup.jaccard_pairs(df, n=1, threshold=0.8).collect()
    }
    got_on = {
        (r.d1, r.d2)
        for r in dedup.prefix_filter_pairs(df, n=1, t_num=4, t_den=5).collect()
    }
    got_off = {
        (r.d1, r.d2)
        for r in dedup.prefix_filter_pairs(
            df, n=1, t_num=4, t_den=5, positional_filter=False
        ).collect()
    }
    assert got_on == want and got_off == want


def test_substring_dedup_excises_noncanonical_repeats(spark):
    """operators/substrings.py (round 10 — Lee et al. ExactSubstr):
    the globally first occurrence of a duplicated L-gram survives;
    every other occurrence's window is excised; untouched docs pass
    through verbatim (single-space re-joined)."""
    from irclogbot_spark.operators.substrings import substring_dedup

    rows = [
        (1, "a b c d e f g h unique one tail"),
        (2, "x y a b c d e f g h z w"),
        (3, "totally different text with no repeats"),
        (4, "x y a b c d e f g h z w"),  # exact dup of 2
        (5, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in substring_dedup(df, length=8).collect()
    }
    assert got[1] == ("a b c d e f g h unique one tail", 11, 0)
    assert got[2] == ("x y z w", 12, 8)  # repeated 8-gram gone
    assert got[3] == ("totally different text with no repeats", 6, 0)
    assert got[4] == ("", 12, 12)  # all grams non-canonical vs doc 2
    assert got[5] == ("short", 1, 0)  # < L tokens: no grams, kept


def test_substring_dedup_merges_overlapping_windows(spark):
    """Two overlapping flagged grams excise the UNION of their
    windows, not double-count: a 9-token repeat under L=8 flags two
    overlapping grams whose union is the 9-token span."""
    from irclogbot_spark.operators.substrings import substring_dedup

    span = "p q r s t u v w x"  # 9 tokens
    rows = [
        (1, span + " ending-one"),
        (2, "lead-in " + span),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in substring_dedup(df, length=8).collect()
    }
    assert got[1] == (span + " ending-one", 0)
    assert got[2] == ("lead-in", 9)  # union of [2..9] and [3..10]


def test_substring_dedup_plan_no_sort_join_and_int_exchanges(spark):
    """Scale pin: no sort-merge join (the h join stays
    hash/broadcast on 8-byte keys), and every hash exchange is keyed
    on h or doc_id — gram strings never enter an exchange."""
    from irclogbot_spark.operators.dedup import md5_hash31
    from irclogbot_spark.operators.substrings import substring_dedup

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        substring_dedup(d, length=8, hash_fn=md5_hash31)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
    hashex = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert hashex
    for l in hashex:
        assert ("h#" in l) or ("doc_id" in l), l


def test_substring_dedup_incremental_history_outranks(spark):
    """substring_dedup_incremental: a batch occurrence of a history
    gram is excised even when the batch doc_id is SMALLER than the
    history doc's (history outranks by deployment order, not id);
    grams unseen in history follow the one-shot within-batch rule."""
    from irclogbot_spark.operators.substrings import (
        gram_index,
        substring_dedup_incremental,
    )

    span = "a b c d e f g h"
    hist = spark.createDataFrame(
        [(100, span + " history tail")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "x y " + span + " z w"),   # id < history's, still excised
            (2, "m n o p q r s t fresh"),
            (3, "m n o p q r s t fresh"),  # in-batch dup of 2
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in substring_dedup_incremental(
            batch, gram_index(hist, length=8), length=8
        ).collect()
    }
    assert got[1] == ("x y z w", 8)
    assert got[2] == ("m n o p q r s t fresh", 0)
    # doc 3 carries TWO duplicated grams (pos 1 and pos 2); their
    # window union [1..9] covers every token
    assert got[3] == ("", 9)


def test_wildcard_search_semantics_and_fallback(spark):
    """operators/trgm.py wildcard_search (round 10): term-level full
    match — * spans any run, ? exactly one char; a prefix pattern
    must NOT match a longer token's interior; patterns without a
    >=3-char literal run (no trigram) take the fallback arm and
    still verify identically."""
    from irclogbot_spark.operators.trgm import (
        py_wildcard_trigrams,
        wildcard_search,
    )

    rows = [
        (1, "slow window batch merge"),
        (2, "slowly unwind"),          # slo* matches 'slowly'; *ndow none
        (3, "batch botch butch"),      # bat?h matches batch ONLY
        (4, "merge emerge"),           # me?ge: merge yes, emerge no (full match)
        (5, "nothing relevant"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.pattern, r.doc_id)
        for r in wildcard_search(
            df, ["slo*", "*ndow", "bat?h", "me?ge"]
        ).collect()
    }
    assert got == {
        ("slo*", 1), ("slo*", 2),
        ("*ndow", 1),              # 'window' ends in ndow; 'unwind' doesn't
        ("bat?h", 1), ("bat?h", 3),  # 'batch' only — botch/butch fail at 'a'
        ("me?ge", 1), ("me?ge", 4),
    }
    assert py_wildcard_trigrams("me?ge") == []  # fallback arm exercised
    assert py_wildcard_trigrams("slo*") == ["slo"]


def test_substring_dedup_materialize_modes_identical(spark):
    """substring_dedup (round 11, VERDICT r10 wrong #2): the
    materialize='disk' option (persist DISK_ONLY — lineage kept, so
    an executor loss recomputes instead of killing a 100 TB
    one-shot) produces output identical to the default
    localCheckpoint path; an unknown mode raises."""
    import pytest as _pytest

    from irclogbot_spark.operators.substrings import substring_dedup

    span = "a b c d e f g h"
    df = spark.createDataFrame(
        [
            (1, f"start {span} mid"),
            (2, f"other intro {span} tail words"),
            (3, "completely unrelated text with no repeats at all"),
        ],
        "doc_id long, text string",
    )
    local = sorted(
        tuple(r) for r in substring_dedup(df, length=8).collect()
    )
    disk = sorted(
        tuple(r)
        for r in substring_dedup(df, length=8, materialize="disk").collect()
    )
    assert local == disk
    assert any(r[3] > 0 for r in local)  # an excision actually happened
    with _pytest.raises(ValueError, match="materialize"):
        substring_dedup(df, length=8, materialize="memory").collect()


def test_substring_gram_hash_default_is_full_width(spark):
    """gram_occurrences (round 11, ADVICE r10 medium): the production
    default gram hash is the FULL 64-bit xxhash64 — excision acts
    directly on hash equality, so the 31-bit fold's ~65k-gram
    birthday bound would silently corrupt text at corpus scale. The
    default must produce values outside the 31-bit fold's range
    (negative longs / > 2^31 are impossible under pmod 2^31-ish
    folding)."""
    from irclogbot_spark.operators.substrings import gram_occurrences

    df = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(12))) for i in range(64)],
        "doc_id long, text string",
    )
    hs = [r.h for r in gram_occurrences(df, length=8).collect()]
    assert hs
    # the old xxhash31 fold was pmod(_, prime < 2^31): always in
    # [0, 2^31). Full xxhash64 over 64 distinct grams is negative or
    # >= 2^31 with probability 1 - 2^-33 per gram.
    assert any(h < 0 or h >= (1 << 31) for h in hs)
