"""Multimodal plumbing invariants at sf0.001: schema, Arrow batch shape,
and the decode stub contract (oracle hash parity is the driver's job)."""

from __future__ import annotations

import pytest

from uw_hadoop_aglorithms_spark.operators import multimodal
from tests.conftest import SF_TEST


def test_media_table_schema_and_metadata(spark):
    mt = multimodal.media_table(spark, SF_TEST)
    kinds = dict(mt.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_type"] == "string"
    rows = mt.collect()
    assert {r.media_type for r in rows} == set(multimodal.MEDIA_TYPES)
    for r in rows:
        # typed metadata is modality-dependent and null elsewhere
        if r.media_type == "image":
            assert r.meta.width is not None and r.meta.sample_rate is None
        elif r.media_type == "audio":
            assert r.meta.sample_rate == 16_000 and r.meta.width is None
        else:
            assert r.meta.fps == 30 and r.meta.width is None
        assert bytes(r.payload)  # payload is real bytes


def test_media_features_survives_small_arrow_batches(spark):
    """The mapInPandas fn must be correct per-batch with no cross-batch
    state — force many small Arrow batches and compare."""
    baseline = {r.doc_id: r for r in multimodal.media_features(spark, SF_TEST).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small = {r.doc_id: r for r in multimodal.media_features(spark, SF_TEST).collect()}
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert small.keys() == baseline.keys()
    for k in baseline:
        assert small[k] == baseline[k]
    for r in baseline.values():
        # hist is a '|'-joined scalar string (driver canonicalizer can't
        # hash list cells); bins must still sum to the byte count
        bins = [int(x) for x in r.hist.split("|")]
        assert len(bins) == multimodal.HIST_BINS
        assert sum(bins) == r.n_bytes
        assert 0.0 <= r.byte_mean <= 255.0


def test_frame_sample_covers_stride(spark):
    rows = multimodal.frame_sample(spark, SF_TEST).collect()
    assert rows
    for r in rows:
        assert r.frame_idx % multimodal.FRAME_STRIDE == 0
        assert 1 <= r.n_bytes <= multimodal.FRAME_BYTES
        assert 0 <= r.frame_hash < multimodal.P


def test_decode_media_shapes_match_metadata(spark):
    mt = multimodal.media_table(spark, SF_TEST)
    meta = {r.doc_id: r.meta for r in mt.collect()}
    rows = multimodal.decode_media(mt).collect()
    assert {r.doc_id for r in rows} == meta.keys()
    for r in rows:
        m = meta[r.doc_id]
        assert r.format == "synthetic/v1"
        if r.media_type == "image":
            assert r.shape == [m.height, m.width]
        elif r.media_type == "audio":
            assert r.shape == [m.n_samples]
            assert all(-1.0 <= s < 1.0 for s in r.data)
        else:
            assert r.shape == [m.n_frames, multimodal.FRAME_BYTES]
        assert len(r.data) == r.shape[0] * (r.shape[1] if len(r.shape) == 2 else 1)


def test_decode_media_roundtrips_payload(spark):
    """Re-encoding the decoded arrays must reproduce the payload bytes up
    to the metadata-declared extent (the synthetic/v1 pad/truncate
    contract): image/video store byte values exactly in doubles; audio's
    (b-128)/128 mapping inverts exactly."""
    mt = multimodal.media_table(spark, SF_TEST)
    payloads = {r.doc_id: bytes(r.payload) for r in mt.collect()}
    for r in multimodal.decode_media(mt).collect():
        raw = payloads[r.doc_id]
        n = len(r.data)
        if r.media_type == "audio":
            enc = bytes(round(s * 128.0 + 128.0) for s in r.data[: len(raw)])
        else:
            enc = bytes(int(v) for v in r.data[: len(raw)])
        k = min(n, len(raw))
        assert enc[:k] == raw[:k]
        # beyond the payload, padding is exactly 0.0 (image/video: zero
        # byte; audio: centered silence)
        assert all(v == 0.0 for v in r.data[k:])


def test_decode_one_property_roundtrip():
    """Generative check of the pure codec (no Spark): for arbitrary
    payload bytes and extents, decode pads/truncates to the declared
    shape and re-encoding reproduces the payload prefix exactly."""
    from hypothesis import given, settings, strategies as st

    from uw_hadoop_aglorithms_spark.operators.multimodal import (
        FRAME_BYTES,
        _decode_one,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.binary(max_size=400),
        st.sampled_from(["image", "audio", "video"]),
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
    )
    def check(raw, mtype, a, b):
        meta = {
            "height": a, "width": b,
            "n_samples": a * b,
            "n_frames": a,
        }
        shape, data = _decode_one(mtype, raw, meta)
        n = shape[0] * (shape[1] if len(shape) == 2 else 1)
        assert len(data) == n
        if mtype == "image":
            assert shape == [a, b]
        elif mtype == "audio":
            assert shape == [a * b]
        else:
            assert shape == [a, FRAME_BYTES]
        k = min(n, len(raw))
        if mtype == "audio":
            enc = bytes(round(s * 128.0 + 128.0) for s in data[:k])
        else:
            enc = bytes(int(v) for v in data[:k])
        assert enc == raw[:k]
        assert all(v == 0.0 for v in data[k:])

    check()


def test_decode_media_rejects_real_formats(spark):
    """Non-synthetic formats still raise: no media libs in this
    container, and the error must be explicit, not a wrong decode."""
    from pyspark.sql import functions as F

    mt = multimodal.media_table(spark, SF_TEST).withColumn(
        "meta",
        F.col("meta").withField("format", F.lit("image/jpeg")),
    )
    with pytest.raises(Exception, match="image/jpeg"):
        multimodal.decode_media(mt).collect()


def test_resize_media_fixed_extents_and_values(spark):
    """resize_media must emit the fixed target extents with values
    reproduced by an independent per-row recompute over the decoded
    arrays (nearest-neighbor index arithmetic / linear interpolation
    written out longhand here, not shared with the implementation)."""
    from uw_hadoop_aglorithms_spark.operators import multimodal as mm

    tbl = mm.media_table(spark, SF_TEST)
    decoded = {
        r.doc_id: (r.media_type, list(r.shape), list(r.data))
        for r in mm.decode_media(tbl).collect()
    }
    resized = mm.resize_media(tbl).collect()
    assert {r.doc_id for r in resized} == set(decoded)

    for r in resized:
        mtype, shape, data = decoded[r.doc_id]
        assert r.media_type == mtype
        got = list(r.data)
        if mtype == "image":
            h, w = shape
            assert list(r.shape) == [mm.RESIZE_H, mm.RESIZE_W]
            for i in range(mm.RESIZE_H):
                for j in range(mm.RESIZE_W):
                    src = data[((i * h) // mm.RESIZE_H) * w + ((j * w) // mm.RESIZE_W)]
                    assert got[i * mm.RESIZE_W + j] == src
        elif mtype == "audio":
            (n,) = shape
            assert list(r.shape) == [mm.RESAMPLE_N]
            assert len(got) == mm.RESAMPLE_N
            # endpoints exact; interior via longhand linear interpolation
            assert got[0] == data[0] and got[-1] == data[n - 1]
            for k in (1, mm.RESAMPLE_N // 2, mm.RESAMPLE_N - 2):
                pos = k * (n - 1) / (mm.RESAMPLE_N - 1)
                lo = int(pos)
                frac = pos - lo
                exp = data[lo] if lo + 1 >= n else data[lo] * (1 - frac) + data[lo + 1] * frac
                assert abs(got[k] - exp) < 1e-9
        else:
            nf = shape[0]
            assert list(r.shape) == [nf, mm.FRAME_RESIZE_BYTES]
            for fi in range(min(nf, 3)):
                for j in range(mm.FRAME_RESIZE_BYTES):
                    src = data[fi * mm.FRAME_BYTES + (j * mm.FRAME_BYTES) // mm.FRAME_RESIZE_BYTES]
                    assert got[fi * mm.FRAME_RESIZE_BYTES + j] == src


# --- real containers (functions/codecs.py + media_real) ---------------------


def test_png_wav_codec_property_roundtrip():
    """Stdlib codec generative check: encode→decode is the identity for
    arbitrary pixel bytes at arbitrary extents (PNG) and arbitrary int16
    samples (WAV)."""
    from hypothesis import given, settings, strategies as st

    from uw_hadoop_aglorithms_spark.functions import codecs

    @settings(max_examples=150, deadline=None)
    @given(
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=1, max_value=30),
        st.binary(min_size=0, max_size=1200),
    )
    def check_png(w, h, raw):
        px = (raw + bytes(w * h))[: w * h]
        assert codecs.png_decode(codecs.png_encode(px, w, h)) == (w, h, px)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(min_value=-32768, max_value=32767), max_size=400))
    def check_wav(samples):
        rate, got = codecs.wav_decode(codecs.wav_encode(samples, 16_000))
        assert rate == 16_000 and got == samples

    check_png()
    check_wav()


def test_png_decode_reconstructs_all_five_filters():
    """The decoder must invert every scanline filter type of PNG §6 —
    our encoder only emits filter 0, so forward-filter each row HERE
    (independent longhand), assemble a raw PNG by hand, and require the
    decoder to recover the original pixels."""
    import random
    import struct
    import zlib

    from uw_hadoop_aglorithms_spark.functions import codecs

    rng = random.Random(99)
    w, h = 23, 10
    px = bytes(rng.randrange(256) for _ in range(w * h))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(w)
    for y in range(h):
        line = px[y * w : (y + 1) * w]
        ft = y % 5  # exercise every filter type across rows
        raw.append(ft)
        for x in range(w):
            left = line[x - 1] if x else 0
            up = prev[x]
            ul = prev[x - 1] if x else 0
            if ft == 0:
                f = line[x]
            elif ft == 1:
                f = (line[x] - left) & 0xFF
            elif ft == 2:
                f = (line[x] - up) & 0xFF
            elif ft == 3:
                f = (line[x] - ((left + up) >> 1)) & 0xFF
            else:
                f = (line[x] - paeth(left, up, ul)) & 0xFF
            raw.append(f)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._chunk(b"IEND", b"")
    )
    assert codecs.png_decode(data) == (w, h, px)


def test_codecs_reject_unsupported_and_corrupt():
    import struct
    import zlib

    from uw_hadoop_aglorithms_spark.functions import codecs

    good = codecs.png_encode(bytes(range(12)), 4, 3)
    # flip one IDAT byte -> CRC failure, not a silent wrong decode
    bad = bytearray(good)
    bad[len(codecs.PNG_SIG) + 8 + 13 + 4 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        codecs.png_decode(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        codecs.png_decode(b"JFIF" + good)
    # RGB (color type 2) and interlaced are explicit non-goals
    for color, interlace, msg in ((2, 0, "grayscale"), (0, 1, "interlaced")):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, color, 0, 0, interlace)
        stream = (
            codecs.PNG_SIG
            + codecs._chunk(b"IHDR", ihdr)
            + codecs._chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
            + codecs._chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError, match=msg):
            codecs.png_decode(stream)
    # stereo WAV is rejected, not mixed down silently
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(16_000)
        wv.writeframes(struct.pack("<4h", 1, 2, 3, 4))
    with pytest.raises(NotImplementedError, match="mono"):
        codecs.wav_decode(buf.getvalue())


def test_decode_media_handles_real_png_and_wav(spark):
    """decode_media over a frame whose payloads are REAL container bytes:
    extents come from the container, values match the encoded content
    on the synthetic/v1 value scale (pixels as bytes, audio in [-1,1))."""
    from pyspark.sql import Row

    from uw_hadoop_aglorithms_spark.functions import codecs

    px = bytes((7 * i + 3) % 256 for i in range(6 * 4))
    samples = [(c - 128) * 256 for c in b"hello real wav"]
    meta = {
        "width": None, "height": None, "sample_rate": None,
        "n_samples": None, "fps": None, "n_frames": None,
    }
    schema = (
        "doc_id long, media_type string, payload binary,"
        " meta struct<width:int,height:int,sample_rate:int,"
        "n_samples:bigint,fps:int,n_frames:int,format:string>"
    )
    df = spark.createDataFrame(
        [
            Row(doc_id=1, media_type="image",
                payload=bytearray(codecs.png_encode(px, 6, 4)),
                meta=Row(**meta, format="image/png")),
            Row(doc_id=2, media_type="audio",
                payload=bytearray(codecs.wav_encode(samples)),
                meta=Row(**meta, format="audio/wav")),
        ],
        schema=schema,
    )
    got = {r.doc_id: r for r in multimodal.decode_media(df).collect()}
    assert list(got[1].shape) == [4, 6]
    assert bytes(int(v) for v in got[1].data) == px
    assert list(got[2].shape) == [len(samples)]
    assert [round(v * 32768.0) for v in got[2].data] == samples


def test_media_real_matches_duckdb_oracle(spark, duck):
    """Full encode→binary column→decode round trip value-checked against
    the closed-form oracle at sf0.001 (the driver re-checks at sf0.01)."""
    from uw_hadoop_aglorithms_spark import oracles

    got = [
        (r.doc_id, r.container, r.n_values, r.byte_sum, r.hist)
        for r in multimodal.media_real(spark, SF_TEST).collect()
    ]
    exp = [tuple(t) for t in duck.execute(
        oracles.MULTIMODAL_ORACLES["media_real"]
    ).fetchall()]
    assert got == exp


def test_media_real_empty_null_and_nonascii_text(spark, tmp_path):
    """ADVICE r8: empty/NULL/non-ASCII-only text rows must agree across
    engines — duckdb's string_split('', '') = [''] used to plant a
    phantom ascii('') = 0 code in histogram bin 0 while the Spark side
    decoded zero samples, and a NULL text raised inside mapInPandas
    while the oracle quietly emitted NULLs. Both sides now pin
    NULL/empty to '' and empty codes to []."""
    import duckdb

    from uw_hadoop_aglorithms_spark import oracles

    # doc_id % 3: 0 = image/png, 1 = audio/wav, 2 = excluded
    rows = [
        (0, "", "en", "s", 0),          # empty image doc → 1 zero pad pixel
        (1, "", "en", "s", 0),          # empty audio doc → zero samples
        (3, "café☃", "en", "s", 5),  # strips to 'caf' (image)
        (4, None, "en", "s", 0),        # NULL audio doc → '' (no raise)
        (6, "☃☃", "en", "s", 2),     # strips to '' (image)
        (7, "hello world", "en", "s", 11),     # normal audio doc
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "mini")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = [
        (r.doc_id, r.container, r.n_values, r.byte_sum, r.hist)
        for r in multimodal.media_real(spark, d).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    exp = [tuple(t) for t in con.execute(
        oracles.MULTIMODAL_ORACLES["media_real"]
    ).fetchall()]
    con.close()
    assert sorted(got) == sorted(exp)
    by_id = dict((g[0], g) for g in got)
    # empty image doc: extent 1x1, one zero pad pixel in bin 0
    assert by_id[0][2:] == (1, 0, "1|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0")
    # empty/NULL/stripped-to-empty audio & image docs: zero values
    assert by_id[1][2] == 0 and by_id[4][2] == 0
    # 'caf' image doc: extent (3%64+1)x(3%48+1) = 4x4, 13 pad zeros
    assert by_id[3][2] == 16 and by_id[3][4].split("|")[0] == "13"
