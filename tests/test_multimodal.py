"""Multimodal plumbing: binary payload round trip, mapInPandas batch
shape/schema, REAL PNG encode/decode (stdlib codec), exact pixel-stat
assertions through the full Spark pipeline, stub contract for the
codec-less modalities."""

from __future__ import annotations

import numpy as np
import pytest

import pyspark.sql.functions as F

from collimate_spark.catalog import load_table
from collimate_spark.functions import png, wav
from collimate_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    IMG_H,
    IMG_W,
    decode_other_stub,
    extract_features,
    multimodal_audio_features,
    multimodal_image_features,
    with_binary_payload,
)


def test_binary_payload_roundtrip(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(10)
    assets = with_binary_payload(docs)
    row = assets.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)
    assert row.meta.mime == "text/plain"
    # payload bytes decode back to the original text
    joined = assets.join(docs, assets.asset_id == docs.doc_id).select(
        "text", F.col("payload").cast("string").alias("decoded")
    )
    assert all(r.text == r.decoded for r in joined.collect())


def test_feature_extraction_batch_shape(spark, sf_dir):
    assets = with_binary_payload(load_table(spark, "documents", sf_dir).limit(20))
    feats = assets.select("asset_id", "payload").mapInPandas(
        extract_features, FEATURE_SCHEMA
    )
    got = feats.collect()
    assert len(got) == 20
    for r in got:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-6  # normalized histogram
        assert 0 <= r.byte_mean <= 255
        assert r.width is None and r.height is None  # text payloads
    # deterministic across runs
    again = assets.select("asset_id", "payload").mapInPandas(
        extract_features, FEATURE_SCHEMA
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_png_roundtrip_exact():
    """encode → decode is pixel-exact for greyscale and RGB."""
    rng = np.random.Generator(np.random.PCG64(42))
    grey = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    assert np.array_equal(png.decode(png.encode(grey)), grey)
    rgb = rng.integers(0, 256, (9, 4, 3), dtype=np.uint8)
    assert np.array_equal(png.decode(png.encode(rgb)), rgb)


def test_png_decode_all_filter_types():
    """The decoder must handle every PNG filter (Sub/Up/Average/Paeth),
    not just the filter-0 our encoder writes — hand-build one scanline
    stream per filter type and verify against the reference unfiltering."""
    import struct
    import zlib

    w, h, ch = 4, 3, 3
    rng = np.random.Generator(np.random.PCG64(7))
    pixels = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    for ftype in (1, 2, 3, 4):
        # forward-filter the raw scanlines with ftype
        raw = bytearray()
        prev = np.zeros(w * ch, dtype=np.int64)
        for r in range(h):
            line = pixels[r].ravel().astype(np.int64)
            filt = np.zeros(w * ch, dtype=np.int64)
            for i in range(w * ch):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (line[i] - pred) & 255
            raw += bytes([ftype]) + bytes(filt.astype(np.uint8))
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            png.SIGNATURE
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + png._chunk(b"IEND", b"")
        )
        assert np.array_equal(png.decode(data), pixels), f"filter {ftype}"


def test_image_features_real_decode(spark, sf_dir):
    """The full Spark pipeline (synthesize PNGs → mapInPandas decode →
    aggregate) must report the TRUE dimensions and the exact pixel mean
    computed independently with numpy — proving real pixel decode, not a
    byte sketch."""
    got = {r.id_bucket: r for r in multimodal_image_features(spark, sf_dir).collect()}
    assert got, "no image feature rows"
    # independent expectation
    ids = [
        r.asset_id
        for r in load_table(spark, "documents", sf_dir)
        .select(F.col("doc_id").alias("asset_id"))
        .filter(F.col("asset_id") < 200)
        .collect()
    ]
    r_, c_, ch_ = (
        np.arange(IMG_H).reshape(-1, 1, 1),
        np.arange(IMG_W).reshape(1, -1, 1),
        np.arange(3).reshape(1, 1, -1),
    )
    by_bucket: dict[int, list[float]] = {}
    for i in ids:
        px = (i * 7 + r_ * 13 + c_ * 29 + ch_ * 101) % 256
        by_bucket.setdefault(i % 10, []).append(float(px.mean()))
    for bucket, means in by_bucket.items():
        row = got[bucket]
        assert row.min_w == IMG_W and row.max_w == IMG_W
        assert row.min_h == IMG_H and row.max_h == IMG_H
        assert row.n_images == len(means)
        assert abs(row.avg_pixel_mean - round(float(np.mean(means)), 4)) < 1e-9


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError, match="codecs"):
        decode_other_stub(b"\x00\x00\x01\xba")  # MPEG-PS magic: video stays stubbed


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra import numpy as hnp

    @settings(max_examples=25, deadline=None)
    @given(
        hnp.arrays(
            np.int16,
            st.tuples(st.integers(1, 64), st.integers(1, 3)),
            elements=st.integers(-32768, 32767),
        ),
        st.sampled_from([8000, 16000, 44100]),
    )
    def test_wav_property_roundtrip(samples, rate):
        got_rate, got = wav.decode(wav.encode(samples, rate))
        assert got_rate == rate
        assert np.array_equal(got, samples)

    @settings(max_examples=25, deadline=None)
    @given(
        hnp.arrays(
            np.uint8,
            st.tuples(st.integers(1, 16), st.integers(1, 16), st.sampled_from([3])),
            elements=st.integers(0, 255),
        )
    )
    def test_png_property_roundtrip(pixels):
        assert np.array_equal(png.decode(png.encode(pixels)), pixels)

    @settings(max_examples=25, deadline=None)
    @given(
        hnp.arrays(
            np.uint8,
            st.tuples(st.integers(0, 6), st.integers(1, 8).map(lambda h: h * 2),
                      st.integers(1, 8).map(lambda w: w * 2)),
            elements=st.integers(0, 255),
        ),
        st.sampled_from([(25, 1), (30, 1), (30000, 1001)]),
        st.sampled_from(["mono", "420jpeg"]),
    )
    def test_y4m_property_roundtrip(frames, fps, chroma):
        from collimate_spark.functions import y4m

        got_fps, got = y4m.decode(y4m.encode(frames, fps=fps, chroma=chroma))
        assert got_fps == fps
        assert got.shape == frames.shape
        assert np.array_equal(got, frames)

except ImportError:  # hypothesis is expected in this container; belt+braces
    pass


def test_wav_roundtrip_exact():
    """encode → decode is sample-exact for mono and stereo int16 PCM."""
    rng = np.random.Generator(np.random.PCG64(42))
    mono = rng.integers(-32768, 32768, 1000, dtype=np.int16)
    rate, out = wav.decode(wav.encode(mono, 8000))
    assert rate == 8000 and np.array_equal(out, mono.reshape(-1, 1))
    stereo = rng.integers(-32768, 32768, (500, 2), dtype=np.int16)
    rate, out = wav.decode(wav.encode(stereo, 44100))
    assert rate == 44100 and np.array_equal(out, stereo)
    assert wav.is_wav(wav.encode(mono, 8000))
    assert not wav.is_wav(b"not a wav")


def test_audio_features_real_decode(spark, sf_dir):
    """The full Spark pipeline (synthesize WAVs → mapInPandas decode →
    aggregate) must report the TRUE frame counts, channel sums, and exact
    RMS computed independently with numpy — proving real sample decode."""
    got = {r.id_bucket: r for r in multimodal_audio_features(spark, sf_dir).collect()}
    assert got, "no audio feature rows"
    ids = [
        r.asset_id
        for r in load_table(spark, "documents", sf_dir)
        .select(F.col("doc_id").alias("asset_id"))
        .filter(F.col("asset_id") < 200)
        .collect()
    ]
    by_bucket: dict[int, dict] = {}
    for aid in ids:
        n = 800 + (aid % 5) * 80
        ch = 1 + (aid % 2)
        i = np.arange(n).reshape(-1, 1)
        c = np.arange(ch).reshape(1, -1)
        x = ((aid * 31 + i * 17 + c * 257) % 32768 - 16384).astype(np.float64)
        mono = x.mean(axis=1)
        b = by_bucket.setdefault(
            aid % 10, {"n": 0, "frames": [], "ch": 0, "rms": [], "zc": 0}
        )
        b["n"] += 1
        b["frames"].append(n)
        b["ch"] += ch
        b["rms"].append(float(np.sqrt((x**2).mean())))
        b["zc"] += int(((mono[:-1] * mono[1:]) < 0).sum())
    for bucket, exp in by_bucket.items():
        row = got[bucket]
        assert row.n_clips == exp["n"]
        assert row.min_frames == min(exp["frames"])
        assert row.max_frames == max(exp["frames"])
        assert row.sum_channels == exp["ch"]
        assert row.sum_zero_crossings == exp["zc"]
        assert abs(row.avg_rms - round(float(np.mean(exp["rms"])), 4)) < 1e-9


def test_y4m_roundtrip_exact():
    """Codec-level: encode→decode is bit-exact for mono and 420 chroma,
    fps survives, truncation raises."""
    from collimate_spark.functions import y4m

    f = (
        (np.arange(4)[:, None, None] * 19 + np.arange(8)[None, :, None] * 3
         + np.arange(12)[None, None, :] * 7) % 256
    ).astype(np.uint8)
    for chroma in ("mono", "420jpeg"):
        data = y4m.encode(f, fps=(30, 1), chroma=chroma)
        fps, g = y4m.decode(data)
        assert fps == (30, 1)
        assert g.shape == f.shape and (g == f).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        y4m.decode(b"NOTAVIDEO")
    with _pytest.raises(ValueError):
        y4m.decode(y4m.encode(f)[:-5])


def test_video_features_real_decode(spark, sf_dir):
    """The full Spark pipeline (synthesize .y4m clips → mapInPandas decode
    → aggregate) must report the TRUE frame counts, luma means, and exact
    panning-gradient motion computed independently with numpy — proving
    real frame decode."""
    from collimate_spark.operators.multimodal import (
        VIDEO_H,
        VIDEO_W,
        multimodal_video_features,
    )

    got = {r.id_bucket: r for r in multimodal_video_features(spark, sf_dir).collect()}
    assert got, "no video feature rows"
    ids = [
        r.asset_id
        for r in load_table(spark, "documents", sf_dir)
        .select(F.col("doc_id").alias("asset_id"))
        .filter(F.col("asset_id") < 200)
        .collect()
    ]
    by_bucket: dict[int, dict] = {}
    for aid in ids:
        n = 3 + (aid % 4)
        f = np.arange(n).reshape(-1, 1, 1)
        r = np.arange(VIDEO_H).reshape(1, -1, 1)
        c = np.arange(VIDEO_W).reshape(1, 1, -1)
        luma = ((aid * 11 + r * 13 + (c + f) * 29) % 256).astype(np.float64)
        motion = float(np.abs(np.diff(luma, axis=0)).mean()) if n > 1 else 0.0
        b = by_bucket.setdefault(aid % 10, {"n": 0, "frames": [], "luma": [], "motion": []})
        b["n"] += 1
        b["frames"].append(n)
        b["luma"].append(float(luma.mean()))
        b["motion"].append(motion)
    for bucket, exp in by_bucket.items():
        row = got[bucket]
        assert row.n_clips == exp["n"]
        assert row.min_frames == min(exp["frames"])
        assert row.max_frames == max(exp["frames"])
        assert row.sum_frames == sum(exp["frames"])
        # Spark rounds HALF_UP, Python HALF_EVEN: compare against the
        # unrounded mean within the rounding quantum instead
        assert abs(row.avg_luma - float(np.mean(exp["luma"]))) <= 5.0001e-5
        assert abs(row.avg_motion - float(np.mean(exp["motion"]))) <= 5.0001e-5


def test_image_resize_mean_preservation(spark, sf_dir):
    """Block-mean downsample preserves the global pixel mean exactly
    (before uint8 rounding): drift must be 0 for our even-dimension
    images, and output geometry must be exactly half."""
    from collimate_spark.operators.multimodal import (
        IMG_H,
        IMG_W,
        RESIZE_FACTOR,
        multimodal_image_resize,
    )

    rows = multimodal_image_resize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.out_w == IMG_W // RESIZE_FACTOR
        assert r.out_h == IMG_H // RESIZE_FACTOR
        # float means identical before rounding: drift exactly 0
        assert r.avg_mean_drift == 0.0
        assert r.sum_out_bytes > 0


def test_frame_sample_counts_exact(spark, sf_dir):
    """Every-2nd-frame sampling: sampled count = ceil(n/2) per clip,
    verified through the aggregated min/max/sum against the synthesis
    rule n = 3 + (aid % 4)."""
    from collimate_spark.operators.multimodal import multimodal_frame_sample

    got = {r.id_bucket: r for r in multimodal_frame_sample(spark, sf_dir).collect()}
    ids = [
        r.asset_id
        for r in load_table(spark, "documents", sf_dir)
        .select(F.col("doc_id").alias("asset_id"))
        .filter(F.col("asset_id") < 200)
        .collect()
    ]
    import math

    by_bucket = {}
    for aid in ids:
        n = 3 + (aid % 4)
        s = math.ceil(n / 2)
        b = by_bucket.setdefault(aid % 10, [])
        b.append(s)
    for bucket, exp in by_bucket.items():
        r = got[bucket]
        assert r.min_frames == min(exp)
        assert r.max_frames == max(exp)
        assert r.sum_frames == sum(exp)


def test_dhash_planted_neardups_and_separation(spark, sf_dir):
    """Every planted one-pixel twin (i, i+100) must surface with
    hamming ≤ 1, and unrelated images must sit far away in hamming
    space (median pairwise distance a large fraction of DHASH_BITS),
    so the ≤3 threshold separates signal from background."""
    import numpy as np
    import pandas as pd

    from collimate_spark.operators.multimodal import (
        DHASH_BITS,
        dhash_kernel,
        multimodal_image_dhash_pairs,
        synthesize_neardup_pngs,
    )

    rows = multimodal_image_dhash_pairs(spark, sf_dir).collect()
    planted = {(r.asset_a, r.asset_b): r.hamming for r in rows if r.asset_b - r.asset_a == 100}
    assert len(planted) == 100
    assert all(h <= 1 for h in planted.values())

    # background separation, measured directly through the same kernels
    ids = pd.DataFrame({"asset_id": list(range(100))})
    payloads = next(iter(synthesize_neardup_pngs(iter([ids]))))
    hashes = next(iter(dhash_kernel(iter([payloads]))))
    hs = [(int(h0), int(h1)) for h0, h1 in zip(hashes["h0"], hashes["h1"])]
    dists = []
    for i in range(0, 100, 7):
        for j in range(i + 1, 100, 11):
            dists.append(bin(hs[i][0] ^ hs[j][0]).count("1") + bin(hs[i][1] ^ hs[j][1]).count("1"))
    assert np.median(dists) > DHASH_BITS * 0.2, np.median(dists)


def test_audio_fingerprint_planted_pairs_and_no_false_positives(spark, sf_dir):
    """Every −54 dB-perturbed audio twin must pair with its base within
    the hamming gate, and no differently-toned pair may pass — the
    precision/recall contract of the spectral fingerprint."""
    from collimate_spark.operators.multimodal import (
        multimodal_audio_fingerprint_pairs,
    )

    rows = multimodal_audio_fingerprint_pairs(spark, sf_dir).collect()
    planted = [r for r in rows if r.asset_b - r.asset_a == 100]
    false_pos = [r for r in rows if r.asset_b - r.asset_a != 100]
    assert len(planted) == 100
    assert not false_pos, false_pos[:3]


def test_scene_cuts_exact_recovery(spark, sf_dir):
    """Every clip's single planted cut (frame 3 + id mod 7) must be the
    ONLY detected cut, and the delta stats must show the designed
    separation: pan ≈ 29, circular cut delta ≈ 99-128."""
    from collimate_spark.operators.multimodal import multimodal_video_scene_cuts

    rows = multimodal_video_scene_cuts(spark, sf_dir).collect()
    assert len(rows) == 150
    for r in rows:
        assert r.n_cuts == 1, r
        assert r.first_cut_frame == 3 + r.asset_id % 7, r
        assert r.median_delta < 35 < 60 < r.max_delta, r
