"""Hypothesis roundtrip properties for the real WAV/BMP codecs —
pure-python (no Spark), so the adversarial tail (extreme sample
values, 1xN / Nx1 rasters, every row-padding residue) is cheap to
sweep. The independent encoder/parser pair means a shared layout
mistake cannot cancel out only if BOTH directions are exercised on
arbitrary content — which is exactly what these do."""

import sys
from pathlib import Path

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.operators.multimodal import (
    decode_bmp_bytes,
    decode_wav_bytes,
    encode_bmp24,
    encode_wav_pcm16,
)

SAMPLES = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200
)


@settings(max_examples=60, deadline=None)
@given(samples=SAMPLES, rate=st.integers(min_value=1, max_value=192000),
       ch=st.integers(min_value=1, max_value=4))
def test_wav_roundtrip(samples, rate, ch):
    # flat interleaved length must be a frame multiple
    usable = samples[: len(samples) - (len(samples) % ch)]
    raw = encode_wav_pcm16(usable, rate, n_channels=ch)
    got_rate, got_ch, bits, frames = decode_wav_bytes(raw)
    assert (got_rate, got_ch, bits) == (rate, ch, 16)
    assert frames.shape == (len(usable) // ch, ch)
    assert list(frames.flatten()) == usable


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
def test_bmp_roundtrip(w, h, data):
    px = [
        [
            tuple(
                data.draw(st.integers(min_value=0, max_value=255))
                for _ in range(3)
            )
            for _ in range(w)
        ]
        for _ in range(h)
    ]
    img = decode_bmp_bytes(encode_bmp24(px))
    assert img.shape == (h, w, 3)
    assert [
        [tuple(int(v) for v in img[y][x]) for x in range(w)] for y in range(h)
    ] == px


def test_wav_empty_payload_roundtrip():
    rate, ch, bits, frames = decode_wav_bytes(encode_wav_pcm16([], 8000))
    assert frames.shape == (0, 1)
    assert isinstance(frames, np.ndarray)
