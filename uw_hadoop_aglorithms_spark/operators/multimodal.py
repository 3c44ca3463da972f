"""Multimodal column plumbing (beyond-reference capability).

Treats image/audio/video as opaque `binary` payload columns with a typed
metadata struct, per the training-data-pipeline brief. Everything
Spark-side is real and tested: the binary schema, the Arrow-batched
`mapInPandas` UDF signatures, the per-batch numpy work, and the
partitioning story (all operators here are map-side; nothing shuffles
payload bytes).

DECODE comes in two tiers. REAL containers that stdlib can handle —
PNG (zlib DEFLATE + full five-filter scanline reconstruction) and WAV
(RIFF PCM16) — decode for real via functions/codecs.py: `media_real`
round-trips actual encoded container bytes through the binary column
and value-checks the decoded content against the DuckDB oracle.
Formats that genuinely need codec libraries (JPEG/FLAC/H.264…) keep a
clearly-marked NotImplementedError — no media libs in this container.

The media table derives deterministically from `documents` (payload =
utf-8 bytes of the text, metadata from doc fields), which keeps every
downstream feature DuckDB-checkable: for ASCII corpora bytes == chars,
so byte histograms / means / frame hashes are expressible over the text
column in the oracle.

At 100 TB: payloads stay columnar in Parquet (BinaryType), feature
extraction is an Arrow-batched scan with no Python-per-row overhead,
and frame sampling multiplies rows map-side before any shuffle — the
same shape a real video pipeline needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uw_hadoop_aglorithms_spark.functions import codecs
from uw_hadoop_aglorithms_spark.functions.hashing import P
from uw_hadoop_aglorithms_spark.sources.catalog import Catalog

MEDIA_TYPES = ("image", "audio", "video")
#: Byte-histogram bins (high nibble).
HIST_BINS = 16
#: Frame sampling: frame size in bytes, keep every STRIDE-th frame.
FRAME_BYTES = 64
FRAME_STRIDE = 4

# `hist` is a '|'-joined string, not array<long>: the driver's pandas
# canonicalizer cannot sort/hash list cells (CORRECTNESS_r01 TypeError),
# and registered query outputs must stay scalar-typed (tests/test_registry).
FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, byte_mean double,"
    " hist string"
)
FRAMES_SCHEMA = "doc_id long, frame_idx long, n_bytes long, frame_hash long"


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media table: binary payload + typed metadata struct.

    media_type cycles deterministically by doc_id; metadata fields are
    type-dependent (image: width/height; audio: sample_rate/n_samples;
    video: fps/n_frames) and derived from n_chars so the table is
    reproducible from the fixture alone.
    """
    docs = Catalog(spark, sf_dir).documents
    mt = F.element_at(F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.when(mt == "image", (F.col("n_chars") % 64 + 1).cast("int")).alias("width"),
            F.when(mt == "image", (F.col("n_chars") % 48 + 1).cast("int")).alias("height"),
            F.when(mt == "audio", F.lit(16_000).cast("int")).alias("sample_rate"),
            F.when(mt == "audio", F.col("n_chars").cast("long")).alias("n_samples"),
            F.when(mt == "video", F.lit(30).cast("int")).alias("fps"),
            F.when(mt == "video", (F.col("n_chars") / FRAME_BYTES).cast("int")).alias("n_frames"),
            F.lit("synthetic/v1").alias("format"),
        ).alias("meta"),
    )


def _features_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = []
        for doc_id, mtype, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            hist = np.bincount(b >> 4, minlength=HIST_BINS).astype("int64")
            out.append(
                (
                    int(doc_id),
                    mtype,
                    int(b.size),
                    float(int(b.sum(dtype=np.int64))) / b.size if b.size else 0.0,
                    "|".join(str(int(h)) for h in hist),
                )
            )
        yield pd.DataFrame(
            out, columns=["doc_id", "media_type", "n_bytes", "byte_mean", "hist"]
        )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched byte features per payload: size, mean byte, 16-bin
    high-nibble histogram. The real feature-extraction plumbing — numpy
    over binary per Arrow batch, zero per-row Python calls."""
    return (
        media_table(spark, sf_dir)
        .select("doc_id", "media_type", "payload")
        .mapInPandas(_features_fn, schema=FEATURES_SCHEMA)
        .orderBy("doc_id")
    )


def _frames_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            n_frames = (len(raw) + FRAME_BYTES - 1) // FRAME_BYTES
            for idx in range(0, n_frames, FRAME_STRIDE):
                frame = raw[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                h = 0
                for c in frame:
                    h = (h * 31 + c) % P
                out.append((int(doc_id), idx, len(frame), h))
        yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "n_bytes", "frame_hash"])


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video payloads: fixed-size byte frames, every
    FRAME_STRIDE-th kept, engine-neutral polyhash per frame (so the
    DuckDB oracle can verify frame content via substr)."""
    return (
        media_table(spark, sf_dir)
        .filter(F.col("media_type") == "video")
        .select("doc_id", "payload")
        .mapInPandas(_frames_fn, schema=FRAMES_SCHEMA)
        .orderBy("doc_id", "frame_idx")
    )


#: decode_media output: one typed array per payload, shape alongside so
#: the flat `data` vector reconstructs the matrix (image: [h, w] row-major
#: pixels; audio: [n_samples] floats in [-1, 1); video: [n_frames, 64]
#: frame-major bytes). Doubles carry image/video byte values exactly.
DECODED_SCHEMA = (
    "doc_id long, media_type string, format string,"
    " shape array<int>, data array<double>"
)

#: Audio sample mapping for synthetic/v1: byte b → (b - 128) / 128.0,
#: exactly invertible (s * 128 + 128 is integral for every byte).
_AUDIO_CENTER = 128.0


def _decode_one(mtype: str, raw: bytes, meta: dict):
    """synthetic/v1 codec: payload bytes → (shape, flat float64 array).

    Deterministic pad/truncate to the metadata-declared extent: images
    fill width×height row-major (zero-padded), audio covers n_samples,
    video keeps the first n_frames full 64-byte frames (a tail shorter
    than one frame is dropped, matching meta.n_frames' truncation).
    """
    import numpy as np

    b = np.frombuffer(raw, dtype=np.uint8)
    if mtype == "image":
        h, w = int(meta["height"]), int(meta["width"])
        px = np.zeros(h * w, dtype=np.float64)
        px[: min(b.size, h * w)] = b[: h * w]
        return [h, w], px
    if mtype == "audio":
        n = int(meta["n_samples"])
        s = np.zeros(n, dtype=np.float64)
        s[: min(b.size, n)] = (b[:n] - _AUDIO_CENTER) / _AUDIO_CENTER
        return [n], s
    nf = int(meta["n_frames"])
    fr = np.zeros(nf * FRAME_BYTES, dtype=np.float64)
    take = min(b.size, nf * FRAME_BYTES)
    fr[:take] = b[:take]
    return [nf, FRAME_BYTES], fr


def _decode_any(mtype: str, fmt: str, raw: bytes, meta: dict):
    """Dispatch one payload to its codec: real PNG/WAV via the stdlib
    decoders (extents come from the CONTAINER, not the metadata), the
    synthetic/v1 codec via _decode_one, anything else an explicit
    raise — JPEG/FLAC/H.264 need codec libs this container lacks."""
    import numpy as np

    if fmt == "image/png":
        w, h, px = codecs.png_decode(raw)
        return [h, w], np.frombuffer(px, dtype=np.uint8).astype(np.float64)
    if fmt == "audio/wav":
        # same value scale as synthetic/v1 audio: int16 -> [-1, 1)
        _rate, samples = codecs.wav_decode(raw)
        return [len(samples)], np.asarray(samples, dtype=np.float64) / 32768.0
    if fmt != "synthetic/v1":
        raise NotImplementedError(
            f"media decode backend for format {fmt!r} not available"
            " (PIL/libav not shipped); only 'synthetic/v1', 'image/png',"
            " 'audio/wav' decode"
        )
    return _decode_one(mtype, raw, meta)


def _decode_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, mtype, payload, meta in zip(
            pdf["doc_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
        ):
            fmt = meta["format"]
            shape, data = _decode_any(mtype, fmt, bytes(payload), meta)
            out.append((int(doc_id), mtype, fmt, shape, data))
        yield pd.DataFrame(
            out, columns=["doc_id", "media_type", "format", "shape", "data"]
        )


def decode_media(df: DataFrame) -> DataFrame:
    """Decode payloads into typed pixel/sample/frame arrays.

    The self-defined `synthetic/v1` codec (media_table) decodes with
    numpy alone: image → width×height row-major pixel matrix, audio →
    centered float samples in [-1, 1), video → n_frames×64 frame-major
    byte matrix, each zero-padded/truncated to the metadata-declared
    extent. REAL containers stdlib can handle decode for real —
    `image/png` (zlib + five-filter reconstruction) and `audio/wav`
    (RIFF PCM16), extents taken from the container itself
    (functions/codecs.py); formats needing codec libraries (JPEG/
    FLAC/H.264…) raise NotImplementedError. The Spark-side shape —
    Arrow-batched mapInPandas over BinaryType, map-side only, no
    payload shuffle — is identical for all.

    Round-trip contract (tests/test_multimodal.py): re-encoding the
    arrays reproduces the payload bytes up to the declared extent.
    """
    return df.select("doc_id", "media_type", "payload", "meta").mapInPandas(
        _decode_fn, schema=DECODED_SCHEMA
    )


#: resize_media targets: images to RESIZE_H×RESIZE_W (nearest-neighbor),
#: audio to RESAMPLE_N samples (linear interpolation), video frames to
#: FRAME_RESIZE_BYTES each (nearest-neighbor within frame, frame count
#: preserved) — the fixed-extent normalization a training pipeline
#: applies before batching tensors.
RESIZE_H = 8
RESIZE_W = 8
RESAMPLE_N = 256
FRAME_RESIZE_BYTES = 8

RESIZED_SCHEMA = (
    "doc_id long, media_type string, shape array<int>, data array<double>"
)


def _resize_one(mtype: str, shape, data):
    """Pure-numpy fixed-extent resize of a decoded synthetic/v1 array."""
    import numpy as np

    arr = np.asarray(data, dtype=np.float64)
    if mtype == "image":
        h, w = int(shape[0]), int(shape[1])
        m = arr.reshape(h, w)
        rows = (np.arange(RESIZE_H) * h) // RESIZE_H
        cols = (np.arange(RESIZE_W) * w) // RESIZE_W
        out = m[np.ix_(rows, cols)]
        return [RESIZE_H, RESIZE_W], out.ravel()
    if mtype == "audio":
        n = int(shape[0])
        if n == 0:
            # a zero-sample real WAV decodes to an empty array (newly
            # reachable via _decode_any); resample to silence rather
            # than let np.interp raise on empty sample points
            return [RESAMPLE_N], np.zeros(RESAMPLE_N)
        if n == 1:
            return [RESAMPLE_N], np.full(RESAMPLE_N, arr[0])
        pos = np.arange(RESAMPLE_N) * (n - 1) / (RESAMPLE_N - 1)
        out = np.interp(pos, np.arange(n), arr)
        return [RESAMPLE_N], out
    nf = int(shape[0])
    m = arr.reshape(nf, FRAME_BYTES)
    cols = (np.arange(FRAME_RESIZE_BYTES) * FRAME_BYTES) // FRAME_RESIZE_BYTES
    out = m[:, cols]
    return [nf, FRAME_RESIZE_BYTES], out.ravel()


def _resize_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, mtype, payload, meta in zip(
            pdf["doc_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
        ):
            shape, data = _decode_any(mtype, meta["format"], bytes(payload), meta)
            rshape, rdata = _resize_one(mtype, shape, data)
            out.append((int(doc_id), mtype, rshape, rdata))
        yield pd.DataFrame(
            out, columns=["doc_id", "media_type", "shape", "data"]
        )


def resize_media(df: DataFrame) -> DataFrame:
    """Decode + fixed-extent resize in ONE Arrow pass (no intermediate
    decoded payload shuffle): images → RESIZE_H×RESIZE_W nearest-
    neighbor, audio → RESAMPLE_N linear resample, video → per-frame
    nearest-neighbor to FRAME_RESIZE_BYTES with frame count preserved.
    The pre-tensor normalization step of a multimodal training
    pipeline; map-side only, like every multimodal op here."""
    return df.select("doc_id", "media_type", "payload", "meta").mapInPandas(
        _resize_fn, schema=RESIZED_SCHEMA
    )


# --- real containers: actual PNG/WAV bytes through the binary column --------

#: WAV sample derivation for the real table: byte b → int16 (b-128)*256
#: — exactly invertible (s // 256 + 128), so decoded content is
#: oracle-expressible over the text column.
_WAV_GAIN = 256

MEDIA_REAL_SCHEMA = "doc_id long, container string, payload binary"
MEDIA_REAL_FEATURES_SCHEMA = (
    "doc_id long, container string, n_values long, byte_sum long, hist string"
)


def _encode_real_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            b = text.encode("ascii")  # upstream projection drops non-ASCII
            if doc_id % 3 == 0:
                # image doc: text bytes laid into the metadata extent
                # (media_table's width/height), zero-padded/truncated
                w, h = len(b) % 64 + 1, len(b) % 48 + 1
                px = (b[: h * w] + bytes(max(0, h * w - len(b))))[: h * w]
                payload, fmt = codecs.png_encode(px, w, h), "image/png"
            else:
                samples = [(c - 128) * _WAV_GAIN for c in b]
                payload, fmt = codecs.wav_encode(samples), "audio/wav"
            out.append((int(doc_id), fmt, bytearray(payload)))
        yield pd.DataFrame(out, columns=["doc_id", "container", "payload"])


def media_real_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media table carrying REAL container bytes: image docs
    (doc_id % 3 == 0) an actual zlib-compressed PNG of the text bytes in
    the metadata extent, audio docs (doc_id % 3 == 1) an actual
    RIFF/WAVE PCM16 stream of (byte-128)*256 samples. Video keeps no
    real-container leg — H.264 needs libav. Encoding is Arrow-batched
    map work, exactly where a crawler's already-encoded payloads would
    enter the pipeline.

    The bytes==chars oracle equivalence is ENFORCED, not assumed
    (code-review r8 finding): non-ASCII codepoints are dropped in the
    projection below, mirrored verbatim by the oracle's regexp — on the
    all-ASCII fixtures this is the identity, and on any future fixture
    both engines see the same byte sequence by construction. NULL text
    coalesces to '' on both sides (ADVICE r8: .encode on a NULL would
    raise inside mapInPandas while the oracle quietly yields NULLs —
    asymmetric failure modes for the same input)."""
    docs = (
        Catalog(spark, sf_dir)
        .documents.filter(F.col("doc_id") % 3 != 2)
        .select(
            "doc_id",
            F.coalesce(
                F.regexp_replace("text", r"[^\x00-\x7F]", ""), F.lit("")
            ).alias("text"),
        )
    )
    return docs.mapInPandas(_encode_real_fn, schema=MEDIA_REAL_SCHEMA)


def _real_features_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = []
        for doc_id, fmt, payload in zip(
            pdf["doc_id"], pdf["container"], pdf["payload"]
        ):
            if fmt == "image/png":
                _w, _h, px = codecs.png_decode(bytes(payload))
                bs = px
            elif fmt == "audio/wav":
                _rate, samples = codecs.wav_decode(bytes(payload))
                bs = bytes(s // _WAV_GAIN + 128 for s in samples)
            else:
                raise NotImplementedError(f"no stdlib decoder for {fmt!r}")
            arr = np.frombuffer(bs, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=HIST_BINS).astype("int64")
            out.append(
                (
                    int(doc_id),
                    fmt,
                    int(arr.size),
                    int(arr.sum(dtype=np.int64)),
                    "|".join(str(int(h)) for h in hist),
                )
            )
        yield pd.DataFrame(
            out,
            columns=["doc_id", "container", "n_values", "byte_sum", "hist"],
        )


def media_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-container round trip under the oracle contract: encode text
    content into ACTUAL PNG/WAV byte streams (media_real_table), ship
    them through the binary column, decode with the stdlib codecs, and
    reduce the decoded content to integer features (value count, exact
    byte sum, 16-bin high-nibble histogram — pad zeros land in bin 0).
    The DuckDB oracle recomputes the same features from the text column
    in closed form (ASCII ⇒ bytes == chars; PNG padding = extent −
    length), so a codec bug anywhere in encode→bytes→decode flips the
    value hash. Both mapInPandas passes are map-side; nothing shuffles
    payload bytes."""
    return (
        media_real_table(spark, sf_dir)
        .mapInPandas(_real_features_fn, schema=MEDIA_REAL_FEATURES_SCHEMA)
        .orderBy("doc_id")
    )
