"""Magic-byte MIME sniffing (operators/multimodal.py ``sniff_mime``)
over real container bytes (the engine's own WAV/BMP encoders) plus
crafted magics, text, control-byte binaries, NULL and empty blobs."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_unload_to_gcs_spark.operators.multimodal import (  # noqa: E402
    encode_bmp24,
    encode_wav_pcm16,
    sniff_mime,
)


def _sniff(spark, blobs):
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "id long, payload binary"
    )
    out = df.select("id", sniff_mime(F.col("payload")).alias("mime"))
    return [r["mime"] for r in out.orderBy("id").collect()]


def test_sniff_real_and_crafted_containers(spark):
    wav = encode_wav_pcm16([0, 1000, -1000, 500], 8000)
    bmp = encode_bmp24([[(255, 0, 0), (0, 255, 0)]])
    blobs = [
        wav,
        bmp,
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 16,
        b"\xff\xd8\xff\xe0rest-of-jpeg",
        b"GIF89a,binary...",
        b"GIF87a,binary...",
        b"%PDF-1.7\n%\xe2\xe3",
        b"\x1f\x8b\x08\x00gz",
        b"PK\x03\x04zipentry",
        b"PK\x05\x06emptyzip",
        b"\x00\x00\x00\x18ftypmp42moov",
        b"RIFFxxxxAVI listmovi",
    ]
    want = [
        "audio/wav", "image/bmp", "image/png", "image/jpeg",
        "image/gif", "image/gif", "application/pdf",
        "application/gzip", "application/zip", "application/zip",
        "video/mp4", "video/avi",
    ]
    assert _sniff(spark, blobs) == want


def test_sniff_text_binary_null_empty(spark):
    blobs = [
        b"plain ascii text\nwith lines\tand tabs\r\n",
        b"{\"json\": true}",
        b"\x00\x01\x02 opaque",
        b"RIFFxxxxJUNK",  # RIFF family but neither WAVE nor AVI
        b"",
        None,
        b"BMP-like text",  # starts 'BM': the 2-byte magic claims it
    ]
    got = _sniff(spark, blobs)
    assert got[0] == "text/plain"
    assert got[1] == "text/plain"
    assert got[2] == "application/octet-stream"
    # unknown RIFF: falls through to the text heuristic (all printable)
    assert got[3] == "text/plain"
    assert got[4] == "application/octet-stream"
    assert got[5] is None
    # the published BMP magic is only 2 bytes — text starting 'BM'
    # claims it; documented false-positive shape, decode stages verify
    assert got[6] == "image/bmp"


def test_sniff_plan_is_narrow(spark):
    df = spark.createDataFrame([(1, b"x")], "id long, payload binary")
    plan = (
        df.select(sniff_mime(F.col("payload")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_sniff_high_byte_binaries_are_not_text(spark):
    """The text heuristic must run on raw bytes, not a UTF-8 decode:
    arbitrary high-byte binaries decode to replacement characters
    (not control chars) and would misread as text/plain. Non-ASCII
    text is the documented conservative flip side."""
    blobs = [
        bytes(range(0x80, 0xC0)),          # random high bytes
        b"\xde\xad\xbe\xef" * 8,           # classic binary soup
        "héllo unicode tèxt".encode(),      # UTF-8 accents: conservative
        b"pure ascii stays text\n",
    ]
    got = _sniff(spark, blobs)
    assert got[0] == "application/octet-stream"
    assert got[1] == "application/octet-stream"
    assert got[2] == "application/octet-stream"  # documented trade
    assert got[3] == "text/plain"
