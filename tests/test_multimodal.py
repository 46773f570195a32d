"""Multimodal plumbing tests: schema/fan-out behavior of the stubbed
decode/resize/frame-sample pipelines, and the stub contract itself."""

import pytest
from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    media_stats,
    resize_images,
    sample_frames,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def payloads(spark):
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    return attach_payload(load_parquet(spark, DOCS).limit(50), "text")


def test_real_decode_paths_are_stubbed(payloads):
    with pytest.raises(NotImplementedError):
        decode_media(payloads)
    with pytest.raises(NotImplementedError):
        resize_images(payloads, width=4, height=4)
    with pytest.raises(NotImplementedError):
        sample_frames(payloads)


def test_resize_fixed_dimensions(payloads):
    out = resize_images(payloads, width=8, height=4, fake=True).collect()
    assert len(out) == 50
    for r in out:
        assert (r.width, r.height) == (8, 4)
        assert len(r.payload) == 32  # width*height bytes


def test_sample_frames_fanout(payloads, spark):
    out = sample_frames(payloads, every_n_bytes=64, max_frames=3, fake=True)
    got = out.collect()
    assert len(got) > 50  # 1->N fan-out
    per_doc = out.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert per_doc <= 3
    for r in got[:20]:
        assert len(r.frame_payload) <= 64


def test_media_stats_aggregates(payloads):
    row = media_stats(payloads).first()
    assert row.media_type == "image"
    assert row.n == 50
    assert row.total_bytes > 0 and row.max_bytes <= row.total_bytes


def test_decode_deterministic(payloads):
    a = {r.doc_id: r.feature for r in decode_media(payloads, fake=True).collect()}
    b = {r.doc_id: r.feature for r in decode_media(payloads, fake=True).collect()}
    assert a == b and len(a) == 50


def test_embed_media_deterministic_and_normalized(spark):
    import math

    import pytest

    from pyspark_unload_to_gcs_spark.operators.multimodal import attach_payload, embed_media

    docs = spark.createDataFrame(
        [(1, "aaaa bbbb"), (2, "aaaa bbbb"), (3, "zzzz completely different")],
        "doc_id bigint, text string",
    )
    payloads = attach_payload(docs, "text")
    out = {r.doc_id: r.embedding for r in embed_media(payloads, dim=16, fake=True).collect()}
    # identical payloads embed identically
    assert out[1] == out[2]
    # unit-normalized
    assert math.isclose(sum(v * v for v in out[1]), 1.0, rel_tol=1e-5)
    assert len(out[3]) == 16 and out[3] != out[1]
    # real encoder is stubbed
    with pytest.raises(NotImplementedError):
        embed_media(payloads, fake=False)


def test_embed_topk_retrieves_self(spark):
    from pyspark_unload_to_gcs_spark.operators.multimodal import attach_payload, embed_media
    from pyspark_unload_to_gcs_spark.operators.similarity import cosine_topk

    docs = spark.createDataFrame(
        [(i, f"document number {i} with shared words") for i in range(20)],
        "doc_id bigint, text string",
    )
    emb = embed_media(attach_payload(docs, "text"), dim=16, fake=True)
    target = emb.filter("doc_id = 7").first().embedding
    top = cosine_topk(emb, [float(v) for v in target], k=3,
                      id_column="doc_id", vec_column="embedding", ensure_parallel=False)
    assert top.first().doc_id == 7  # nearest neighbor of a vector is itself


# --------------------------------------------------------------------------
# Real uncompressed-format decoders (WAV/PCM16, BMP24)
# --------------------------------------------------------------------------


def test_decode_wav_bytes_rejects_malformed():
    import pytest as _pytest

    from pyspark_unload_to_gcs_spark.operators.multimodal import decode_wav_bytes

    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav_bytes(b"not a wav")
    with _pytest.raises(ValueError, match="missing fmt"):
        decode_wav_bytes(b"RIFF\x04\x00\x00\x00WAVE")


def test_decode_wav_bytes_rejects_non_pcm16():
    import struct

    import pytest as _pytest

    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        decode_wav_bytes,
        encode_wav_pcm16,
    )

    raw = bytearray(encode_wav_pcm16([0, 1, 2], 8000))
    struct.pack_into("<H", raw, 20, 3)  # IEEE float format tag
    with _pytest.raises(ValueError, match="only PCM16"):
        decode_wav_bytes(bytes(raw))


def test_decode_wav_walks_extra_chunks():
    import struct

    import numpy as np

    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        decode_wav_bytes,
        encode_wav_pcm16,
    )

    raw = encode_wav_pcm16([5, -5, 100, -100], 16000, n_channels=2)
    # splice an odd-sized LIST chunk (word-aligned with a pad byte)
    listchunk = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    spliced = raw[:36] + listchunk + raw[36:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, ch, bits, frames = decode_wav_bytes(spliced)
    assert (rate, ch, bits) == (16000, 2, 16)
    assert np.array_equal(frames, np.array([[5, -5], [100, -100]]))


def test_decode_bmp_top_down_variant():
    import struct

    import numpy as np

    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        decode_bmp_bytes,
        encode_bmp24,
    )

    px = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    raw = bytearray(encode_bmp24(px))
    # negative height = top-down raster; row order in the file is then
    # already top-to-bottom, so flip the stored rows to keep content
    h = struct.unpack_from("<i", raw, 22)[0]
    stride = ((2 * 3 + 3) // 4) * 4
    body = bytes(raw[54:])
    flipped = b"".join(body[i * stride : (i + 1) * stride] for i in reversed(range(h)))
    raw2 = bytes(raw[:54]) + flipped
    raw2 = bytearray(raw2)
    struct.pack_into("<i", raw2, 22, -h)
    img = decode_bmp_bytes(bytes(raw2))
    assert [[tuple(int(v) for v in img[y][x]) for x in range(2)] for y in range(2)] == px


def test_decode_bmp_rejects_unsupported():
    import pytest as _pytest

    from pyspark_unload_to_gcs_spark.operators.multimodal import decode_bmp_bytes

    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp_bytes(b"xx" + b"\x00" * 60)


def test_wav_bmp_spark_roundtrip(spark):
    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp24,
        encode_wav_pcm16,
    )

    wav = encode_wav_pcm16([100, -200, 300], 8000)
    bmp = encode_bmp24([[(10, 20, 30)]])
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    row = decode_wav(df).collect()[0]
    assert (row["n_frames"], row["peak_abs"], row["sum_abs"]) == (3, 300, 600)
    df2 = spark.createDataFrame([(2, bytearray(bmp))], "doc_id long, payload binary")
    row2 = decode_bmp(df2).collect()[0]
    assert (row2["width"], row2["height"], row2["sum_r"], row2["sum_g"], row2["sum_b"]) == (1, 1, 10, 20, 30)


def test_decode_wav_rejects_truncated_fmt_and_zero_rate():
    import struct

    import pytest as _pytest

    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        decode_wav_bytes,
        encode_wav_pcm16,
    )

    # fmt chunk declares 16 bytes but the file ends mid-chunk
    truncated = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + struct.pack("<4sI", b"fmt ", 16) + b"\x01\x00"
    with _pytest.raises(ValueError, match="truncated fmt"):
        decode_wav_bytes(truncated)
    # well-formed but sample_rate=0 would divide by zero downstream
    raw = bytearray(encode_wav_pcm16([1, 2], 8000))
    struct.pack_into("<I", raw, 24, 0)
    with _pytest.raises(ValueError, match="sample rate"):
        decode_wav_bytes(bytes(raw))


def test_decode_bmp_rejects_negative_width():
    import struct

    import pytest as _pytest

    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        decode_bmp_bytes,
        encode_bmp24,
    )

    raw = bytearray(encode_bmp24([[(1, 2, 3)]]))
    struct.pack_into("<i", raw, 18, -1)
    with _pytest.raises(ValueError, match="negative width"):
        decode_bmp_bytes(bytes(raw))


def test_ahash_matches_independent_reference_and_general_sizes():
    """ahash_bits_from_image vs a dumb per-pixel reference (no
    reduceat, no vectorization) across non-multiple-of-8 sizes — the
    unequal-block integer rule must agree everywhere."""
    import random

    import numpy as np

    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        ahash_bits_from_image,
    )

    def reference(img):
        h, w = img.shape[0], img.shape[1]
        lum = [
            [
                299 * int(img[y, x, 0]) + 587 * int(img[y, x, 1]) + 114 * int(img[y, x, 2])
                for x in range(w)
            ]
            for y in range(h)
        ]
        ys = [(b * h) // 8 for b in range(8)] + [h]
        xs = [(b * w) // 8 for b in range(8)] + [w]
        sums, cnts = [], []
        for by in range(8):
            for bx in range(8):
                s = c = 0
                for y in range(ys[by], ys[by + 1]):
                    for x in range(xs[bx], xs[bx + 1]):
                        s += lum[y][x]
                        c += 1
                sums.append(s)
                cnts.append(c)
        t, n = sum(sums), sum(cnts)
        out = 0
        for j in range(64):
            if sums[j] * n > t * cnts[j]:
                out |= 1 << j
        return out

    rng = random.Random(7)
    for (h, w) in [(8, 8), (16, 16), (12, 20), (9, 31), (50, 8)]:
        img = np.array(
            [[[rng.randrange(256) for _ in range(3)] for _ in range(w)] for _ in range(h)],
            dtype=np.uint8,
        )
        assert ahash_bits_from_image(img) == reference(img), f"{w}x{h}"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="smaller than"):
        ahash_bits_from_image(np.zeros((7, 8, 3), dtype=np.uint8))


def test_ahash_dup_pairs_pigeonhole_exact(spark):
    """Banded candidate generation must find EVERY pair within the
    hamming threshold (pigeonhole exactness) and reject everything
    beyond it: planted exact duplicate (hamming 0), a 7-bit twin
    (threshold boundary), an 8-bit twin (just over), and random
    far-apart decoys — verified against direct popcount over all
    pairs."""
    from itertools import combinations

    from pyspark_unload_to_gcs_spark.operators.multimodal import ahash_dup_pairs

    def split(bits):
        return bits >> 32, bits & 0xFFFFFFFF

    base = 0x0F0F0F0F0F0F0F0F
    rows = [
        (1, *split(base)),
        (2, *split(base)),                     # hamming 0 vs 1
        (3, *split(base ^ 0x7F)),              # hamming 7 vs 1 (boundary)
        (4, *split(base ^ 0xFF)),              # hamming 8 vs 1 (excluded)
        (5, *split(0xA5A5A5A5A5A5A5A5)),       # far from everything
    ]
    df = spark.createDataFrame(rows, "doc_id long, ahash_hi long, ahash_lo long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_dup_pairs(df, max_hamming=7).collect()
    }
    want = {}
    for (ia, hia, loa), (ib, hib, lob) in combinations(rows, 2):
        d = bin((hia ^ hib)).count("1") + bin((loa ^ lob)).count("1")
        if d <= 7:
            want[(ia, ib)] = d
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 0
    assert (1, 3) in got and got[(1, 3)] == 7
    assert (1, 4) not in got

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_hamming"):
        ahash_dup_pairs(df, max_hamming=8)


# ---------------------------------------------------------------------------
# audio energy-contour fingerprint (afp)
# ---------------------------------------------------------------------------


def _afp_model(frames):
    """Independent brute model of afp_bits_from_frames: plain python
    loops, no reduceat — a shared indexing mistake can't cancel."""
    n = len(frames)
    energy = [sum(abs(int(s)) for s in row) for row in frames]
    total = sum(energy)
    out = 0
    for k in range(64):
        lo, hi = (k * n) // 64, ((k + 1) * n) // 64
        wsum = sum(energy[lo:hi])
        if wsum * n > (hi - lo) * total:
            out |= 1 << k
    return out


def test_afp_matches_brute_model_fuzz():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        afp_bits_from_frames,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=64, max_value=300),
        ch=st.integers(min_value=1, max_value=2),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def run(n, ch, seed):
        rng = np.random.default_rng(seed)
        frames = rng.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
        assert afp_bits_from_frames(frames) == _afp_model(frames.tolist())

    run()


def test_afp_amplitude_scale_invariant_and_guards():
    import numpy as np

    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        afp_bits_from_frames,
    )

    rng = np.random.default_rng(7)
    frames = rng.integers(-1024, 1024, size=(200, 2), dtype=np.int16)
    base = afp_bits_from_frames(frames)
    assert afp_bits_from_frames(frames * 3) == base  # exact invariance
    assert 0 <= base < 2**64
    with pytest.raises(ValueError, match="64-window"):
        afp_bits_from_frames(frames[:63])


def test_afp_exact_beyond_int64_products(rng_seed=11):
    """The above-mean cross-products (window_sum * n vs len * total)
    overflow int64 for long-enough clips; the bit rule must be exact
    arithmetic, not numpy wraparound — checked with int64 frame values
    large enough that the products exceed 2^63 at 64 frames (review
    r12). Scale invariance is the observable: a *5 amplitude copy must
    hash identically, which wraparound breaks."""
    import numpy as np

    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        afp_bits_from_frames,
    )

    rng = np.random.default_rng(rng_seed)
    frames = rng.integers(2**40, 2**45, size=(128, 1), dtype=np.int64)
    got = afp_bits_from_frames(frames)
    assert got == _afp_model(frames.tolist())
    assert afp_bits_from_frames(frames * 5) == got


def test_audio_fingerprint_dup_pairs_end_to_end(spark):
    """WAV bytes -> real decode -> afp -> the SAME byte-band dup join
    as images: every doc gets a volume-doubled twin (+1000) whose
    fingerprint is identical (hamming 0); pairs across different docs
    must stay out at the threshold."""
    from pyspark_unload_to_gcs_spark.operators.multimodal import (
        ahash_dup_pairs,
        audio_fingerprint,
        encode_wav_pcm16,
    )

    import numpy as np

    rows = []
    for d in range(12):
        n = 64 * (4 + d % 5)
        # per-doc seeded noise: a shared ramp would give every clip a
        # near-flat energy contour and near-tied bits across docs
        samples = [
            int(s)
            for s in np.random.default_rng(d).integers(-4096, 4096, size=n)
        ]
        rows.append((d, encode_wav_pcm16(samples, 8000)))
        rows.append((d + 1000, encode_wav_pcm16([2 * s for s in samples], 8000)))
    clips = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = audio_fingerprint(clips)
    got = {
        (r["id_a"], r["id_b"])
        for r in ahash_dup_pairs(
            hashes, hi_column="afp_hi", lo_column="afp_lo", max_hamming=2
        ).collect()
    }
    assert {(d, d + 1000) for d in range(12)} <= got
    # twins are hamming-0; everything else in `got` must still be a
    # (d, d+1000) pair — unrelated clips differ in far more than 2 bits
    assert got == {(d, d + 1000) for d in range(12)}
