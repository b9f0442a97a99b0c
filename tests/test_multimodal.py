"""Real in-engine PPM decode: roundtrip, header parsing, decoded
channel statistics vs the pixel generator."""

from __future__ import annotations


def test_ppm_roundtrip_and_header_parsing(spark):
    import numpy as np

    from mms_rdf_spark.operators.multimodal import (
        decode_ppm, encode_ppm, ppm_pixels)

    # non-square, multi-digit dims exercise the header tokenizer
    arr = ppm_pixels(12345, h=13, w=107)
    assert decode_ppm(encode_ppm(arr)).shape == (13, 107, 3)
    assert (decode_ppm(encode_ppm(arr)) == arr).all()
    # compressed formats stay honestly stubbed
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        decode_ppm(b"\x89PNG\r\n\x1a\n....")


def test_image_stats_real_decode(spark):
    import numpy as np

    from mms_rdf_spark.operators.multimodal import (
        image_stats, ppm_pixels, synth_ppm_media)

    docs = spark.createDataFrame(
        [(i, f"t{i}", "en", "s0", 10) for i in (0, 7, 123)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = {r.media_id: r for r in
           image_stats(synth_ppm_media(docs, h=8, w=8)).collect()}
    for mid in (0, 7, 123):
        exp = ppm_pixels(mid, 8, 8).astype(np.int64).mean(axis=(0, 1))
        got = out[mid]
        assert (got.mean_r, got.mean_g, got.mean_b) \
            == (exp[0], exp[1], exp[2])
        assert got.width == 8 and got.height == 8


def test_wav_roundtrip_and_chunk_walk(spark):
    import struct

    import numpy as np
    import pytest as _pytest

    from mms_rdf_spark.operators.multimodal import (
        decode_wav, encode_wav, wav_samples)

    s = wav_samples(99, n=37)
    got, rate = decode_wav(encode_wav(s, rate=16000))
    assert rate == 16000 and (got == s).all()
    # decoder walks chunk lists: inject a LIST chunk between fmt and data
    raw = encode_wav(s, rate=8000)
    fmt_end = raw.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    got2, rate2 = decode_wav(patched)
    assert rate2 == 8000 and (got2 == s).all()
    with _pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x03mp3 payload...")


def test_audio_stats_real_decode(spark):
    import numpy as np

    from mms_rdf_spark.operators.multimodal import (
        audio_stats, synth_wav_media, wav_samples)

    docs = spark.createDataFrame(
        [(i, f"t{i}", "en", "s0", 10) for i in (0, 5, 42)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = {r.media_id: r for r in
           audio_stats(synth_wav_media(docs, n=64)).collect()}
    for mid in (0, 5, 42):
        s = wav_samples(mid, 64).astype(np.int64)
        got = out[mid]
        assert got.n_samples == 64 and got.sample_rate == 8000
        assert got.peak == int(np.abs(s).max())
        assert got.mean_square == float((s * s).sum()) / 64


def test_y4m_roundtrip_and_frame_stats(spark):
    import numpy as np
    import pytest as _pytest

    from mms_rdf_spark.operators.multimodal import (
        decode_y4m, encode_y4m, synth_y4m_media, video_frame_stats,
        y4m_luma)

    stack = decode_y4m(encode_y4m(77, n_frames=3, h=6, w=10))
    assert stack.shape == (3, 6, 10)
    for f in range(3):
        assert (stack[f] == y4m_luma(77, f, 6, 10)).all()
    with _pytest.raises(NotImplementedError):
        decode_y4m(b"\x00\x00\x00 ftypisom mp4 payload")

    docs = spark.createDataFrame(
        [(3, "t", "en", "s0", 10)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = sorted(video_frame_stats(synth_y4m_media(docs), every=2)
                 .collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in out] == [0, 2]
    for r in out:
        exp = y4m_luma(3, r.frame_idx, 8, 8).astype(np.int64).mean()
        assert r.mean_y == exp


def test_image_ahash_and_neardup_pairs(spark):
    import numpy as np

    from mms_rdf_spark.operators.multimodal import (
        encode_ppm, image_ahash, image_neardup_pairs, ppm_pixels)

    base = ppm_pixels(42, 8, 8)
    near = base.copy()
    near[0, 0, :] = 255 - near[0, 0, :].astype(np.int64)  # 1-px change
    far = ppm_pixels(999983, 8, 8)  # unrelated gradient
    media = spark.createDataFrame(
        [(0, "image", bytearray(encode_ppm(base)), 8, 8, 1),
         (1, "image", bytearray(encode_ppm(near)), 8, 8, 1),
         (2, "image", bytearray(encode_ppm(far)), 8, 8, 1)],
        "media_id long, kind string, payload binary, width int, "
        "height int, n_frames int")
    hashes = image_ahash(media)
    rows = {r.media_id: (r.hash_hi, r.hash_lo) for r in hashes.collect()}
    assert len(rows) == 3
    # near-identical images differ in few bits; hamming pairs find them
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in image_neardup_pairs(hashes, max_hamming=6).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 6
    # pair output is deduplicated across band collisions
    assert len([k for k in pairs if k == (0, 1)]) == 1


def test_image_ahash_identical_images_collide(spark):
    from mms_rdf_spark.operators.multimodal import (
        encode_ppm, image_ahash, image_neardup_pairs, ppm_pixels)

    img = ppm_pixels(7, 8, 8)
    media = spark.createDataFrame(
        [(i, "image", bytearray(encode_ppm(img)), 8, 8, 1)
         for i in range(4)],
        "media_id long, kind string, payload binary, width int, "
        "height int, n_frames int")
    pairs = image_neardup_pairs(image_ahash(media), max_hamming=0)
    assert pairs.count() == 6  # all C(4,2) exact-duplicate pairs


def test_audio_silence_runs_known_pattern(spark):
    import numpy as np

    from mms_rdf_spark.operators.multimodal import (
        audio_silence_runs, encode_wav)

    # crafted track: loud, [quiet x3], loud, [quiet x2]
    s = np.array([20000, 10, -20, 5, -30000, 100, -100],
                 dtype=np.int16)
    media = spark.createDataFrame(
        [(0, "audio", bytearray(encode_wav(s)), 0, 0, 7)],
        "media_id long, kind string, payload binary, width int, "
        "height int, n_frames int")
    out = audio_silence_runs(media, threshold=3000).collect()[0]
    assert out.n_quiet == 5 and out.longest_run == 3
    # all-loud track: zero quiet, zero run
    loud = np.full(8, 30000, dtype=np.int16)
    media2 = spark.createDataFrame(
        [(1, "audio", bytearray(encode_wav(loud)), 0, 0, 8)],
        "media_id long, kind string, payload binary, width int, "
        "height int, n_frames int")
    out2 = audio_silence_runs(media2, threshold=3000).collect()[0]
    assert out2.n_quiet == 0 and out2.longest_run == 0


def test_png_roundtrip_all_filter_types():
    import numpy as np
    import pytest

    from mms_rdf_spark.operators.multimodal import (
        decode_image, decode_png, encode_png, ppm_pixels)

    for mid, (h, w) in [(0, (8, 8)), (7, (5, 11)), (123, (9, 3))]:
        a = ppm_pixels(mid, h, w)
        # varied filters: rows cycle None/Sub/Up/Average/Paeth
        assert (decode_png(encode_png(a)) == a).all()
        assert (decode_png(encode_png(a, varied_filters=False))
                == a).all()
        # the dispatcher picks the PNG decoder from the magic bytes
        assert (decode_image(encode_png(a)) == a).all()
    # honest stubs: unsupported variants raise, not garbage
    with pytest.raises(NotImplementedError):
        decode_png(b"\xff\xd8\xffJFIF not a png")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xffJFIF jpeg payload")


def test_png_stats_matches_ppm_stats(spark):
    """The decoded channel means must be identical between the PPM and
    PNG encodings of the same generator image — one scan, Arrow lane,
    binary never shuffled (same plan discipline as image_stats)."""
    from mms_rdf_spark.operators.multimodal import (
        image_stats, synth_png_media, synth_ppm_media)

    docs = spark.createDataFrame(
        [(i, f"text {i}", 10 + i) for i in range(12)],
        "doc_id long, text string, n_chars int")
    a = image_stats(synth_ppm_media(docs)).orderBy("media_id").collect()
    b = image_stats(synth_png_media(docs)).orderBy("media_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_resize_nearest_neighbor_exact(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from mms_rdf_spark.operators.multimodal import (
        decode_image,
        ppm_pixels,
        resize_images,
        synth_ppm_media,
    )

    docs = spark.range(3).select(F.col("id").alias("doc_id"))
    out = resize_images(synth_ppm_media(docs), out_h=4,
                        out_w=4).collect()
    assert len(out) == 3
    for r in out:
        assert (r.width, r.height) == (4, 4)
        got = decode_image(bytes(r.payload))
        src = ppm_pixels(r.media_id, 8, 8)
        idx = (np.arange(4) * 8) // 4
        want = src[idx][:, idx]
        assert (got == want).all()


def test_resize_non_divisible_dims(spark):
    from pyspark.sql import functions as F

    from mms_rdf_spark.operators.multimodal import (
        resize_images,
        synth_ppm_media,
    )

    docs = spark.range(2).select(F.col("id").alias("doc_id"))
    out = resize_images(synth_ppm_media(docs, h=8, w=8),
                        out_h=3, out_w=5).collect()
    assert all((r.width, r.height) == (5, 3) for r in out)


def test_bmp_roundtrip_padding_and_stats_parity(spark):
    import numpy as np

    from mms_rdf_spark.operators.multimodal import (
        decode_bmp, decode_image, encode_bmp, image_stats, ppm_pixels,
        synth_bmp_media, synth_ppm_media)

    # odd width exercises the 4-byte row padding; roundtrip is exact
    arr = ppm_pixels(54321, h=5, w=7)
    assert (decode_bmp(encode_bmp(arr)) == arr).all()
    # dispatch on the BM magic
    assert (decode_image(encode_bmp(arr)) == arr).all()

    # top-down variant (negative height) decodes identically
    import struct
    raw = bytearray(encode_bmp(arr))
    h = struct.unpack_from("<i", raw, 22)[0]
    struct.pack_into("<i", raw, 22, -h)
    stride = (7 * 3 + 3) // 4 * 4
    flipped = bytearray(raw[:54])
    body = raw[54:]
    for r in range(5):                       # re-order rows top-down
        flipped += body[(4 - r) * stride:(5 - r) * stride]
    assert (decode_bmp(bytes(flipped)) == arr).all()

    # image_stats over BMP payloads == over PPM payloads (same pixels)
    docs = spark.createDataFrame([(i,) for i in range(6)],
                                 "doc_id long")
    a = sorted(image_stats(synth_bmp_media(docs)).collect())
    b = sorted(image_stats(synth_ppm_media(docs)).collect())
    assert a == b and len(a) == 6

    # compressed/paletted guard raises the honest stub
    bad = bytearray(encode_bmp(arr))
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    try:
        decode_bmp(bytes(bad))
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_image_dhash_matches_numpy_and_guards(spark):
    from mms_rdf_spark.operators import multimodal as MM
    import numpy as np

    docs = spark.createDataFrame([(i, "x") for i in range(5)],
                                 "doc_id long, text string")
    media = MM.synth_ppm_media(docs, h=8, w=9)
    got = {r["media_id"]: (r["hash_hi"], r["hash_lo"])
           for r in MM.image_dhash(media).collect()}
    assert len(got) == 5
    for mid in range(5):
        gray = MM.ppm_pixels(mid, 8, 9).astype(np.int64).sum(axis=2) // 3
        bits = np.zeros(64, dtype=np.int64)
        bits[:64] = (gray[:, 1:] > gray[:, :-1]).astype(np.int64) \
            .reshape(-1)
        lo = int((bits[:32] << np.arange(32)).sum())
        hi = int((bits[32:] << np.arange(32)).sum())
        assert got[mid] == (hi, lo)

    # a level shift leaves dhash unchanged (the ahash failure mode):
    # gray+10 everywhere has identical gradients by construction --
    # covered analytically by the gradient definition; here we pin
    # that >64 bits refuses loudly instead of silently truncating
    import pytest as _pt
    wide = MM.synth_ppm_media(docs.limit(1), h=8, w=10)
    with _pt.raises(Exception):
        MM.image_dhash(wide).collect()


def test_audio_zcr_matches_numpy(spark):
    from mms_rdf_spark.operators import multimodal as MM
    import numpy as np

    docs = spark.createDataFrame([(i, "x") for i in range(4)],
                                 "doc_id long, text string")
    got = {r["media_id"]: (r["n_samples"], r["zero_crossings"],
                           r["ac1_num"])
           for r in MM.audio_zcr(MM.synth_wav_media(docs)).collect()}
    for mid in range(4):
        s = MM.wav_samples(mid).astype(np.int64)
        prod = s[:-1] * s[1:]
        assert got[mid] == (64, int((prod < 0).sum()), int(prod.sum()))

    # a pure alternating-sign square wave crosses at every step
    sq = MM.encode_wav(np.array([1000, -1000] * 8, dtype=np.int16))
    media = spark.createDataFrame([(99, "audio", bytearray(sq), 0, 0, 0)],
                                  MM.MEDIA_SCHEMA)
    r = MM.audio_zcr(media).collect()[0]
    assert r["zero_crossings"] == 15 and r["ac1_num"] == -15 * 1000000


def _media(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, payload binary")


def test_cdc_chunks_reconstruct_and_clamps(spark):
    import hashlib

    from mms_rdf_spark.operators.multimodal import cdc_chunks

    rng_bytes = hashlib.sha256(b"seed").digest() * 40  # 1280 bytes
    small = b"tiny"
    media = _media(spark, [rng_bytes, small])
    rows = cdc_chunks(media, min_size=16, avg_bits=5,
                      max_size=128).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, payload in [(0, rng_bytes), (1, small)]:
        chunks = sorted(by_media[mid], key=lambda r: r.chunk_idx)
        # contiguous cover of the payload
        pos = 0
        for c in chunks:
            assert c.offset == pos
            pos += c.length
            assert hashlib.md5(
                payload[c.offset:c.offset + c.length]).hexdigest() \
                == c.chunk_hash
        assert pos == len(payload)
        # clamps: all but the last chunk within [min, max]
        for c in chunks[:-1]:
            assert 16 < c.length <= 128
        assert chunks[-1].length <= 128


def test_cdc_shared_suffix_shares_chunks(spark):
    import hashlib

    from mms_rdf_spark.operators.multimodal import (
        cdc_chunks,
        cdc_dedup_stats,
    )

    # non-repeating 1280 bytes (a periodic payload would dedup
    # against ITSELF — the operator catches that too, but here we
    # want the cross-payload effect isolated)
    base = b"".join(hashlib.sha256(b"blk%d" % i).digest()
                    for i in range(40))
    shifted = b"PREFIX-OF-DIFFERENT-LENGTH!" + base
    media = _media(spark, [base, shifted])
    ch = cdc_chunks(media, min_size=16, avg_bits=5, max_size=128)
    rows = ch.collect()
    h0 = {r.chunk_hash for r in rows if r.media_id == 0}
    h1 = {r.chunk_hash for r in rows if r.media_id == 1}
    # content-defined boundaries re-align after the foreign prefix
    assert len(h0 & h1) >= len(h0) // 2
    st = cdc_dedup_stats(ch).collect()[0]
    assert st.n_media == 2
    assert st.total_bytes == len(base) + len(shifted)
    assert st.dedup_ratio < 0.75  # real sharing detected

    # whole-payload duplicates collapse to ~half the bytes
    dup = _media(spark, [base, base])
    st2 = cdc_dedup_stats(
        cdc_chunks(dup, min_size=16, avg_bits=5, max_size=128)) \
        .collect()[0]
    assert st2.dedup_ratio == round(
        st2.distinct_bytes / st2.total_bytes, 6)
    assert st2.distinct_bytes * 2 == st2.total_bytes

    # empty input -> 0 rows
    assert cdc_dedup_stats(
        cdc_chunks(media.where("media_id < 0"))).count() == 0


def test_image_entropy_real_decode(spark):
    import math

    from mms_rdf_spark.operators.multimodal import (
        image_entropy,
        image_histogram,
        ppm_pixels,
        synth_ppm_media,
    )

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 10) for i in (1, 2, 3)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    media = synth_ppm_media(docs)
    # histogram matches the generator's pixel counts exactly
    h = {(r.media_id, r.value): r.cnt for r in
         image_histogram(media).collect()}
    import numpy as np
    arr = ppm_pixels(1, 8, 8).reshape(-1)
    vals, cnts = np.unique(arr, return_counts=True)
    for v, c in zip(vals, cnts):
        assert h[(1, int(v))] == int(c)
    # entropy matches a pure-Python computation on those counts
    e = {r.media_id: r.entropy for r in
         image_entropy(media).collect()}
    n = len(arr)
    ref = math.log(n) - sum(
        int(c) * math.log(int(c)) for c in cnts) / n
    assert abs(e[1] - ref) < 1e-6
    assert all(v > 0 for v in e.values())
