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
