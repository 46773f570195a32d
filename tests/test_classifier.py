"""Hashed-feature linear classifier tests: bucket-hash parity with an
independent Python md5, exact integer accumulation vs a referee,
zero-token/missing-bucket handling, and the broadcast join plan."""

import hashlib
import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.operators.classifier import (
    MICRO,
    linear_text_classifier,
    synthetic_weights,
    token_bucket,
)

D = 512


def py_bucket(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % D


def py_weight(bucket: int) -> int:
    return (bucket * 2654435761) % 1000003 - 500001


def test_token_bucket_matches_python_md5(spark):
    toks = ["hello", "world", "a", "0z", "the", "42", "x9y"]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {
        r["token"]: r["b"]
        for r in df.select("token", token_bucket(F.col("token"), D).alias("b")).collect()
    }
    assert got == {t: py_bucket(t) for t in toks}


def test_classifier_matches_python_referee(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = {
        r["doc_id"]: (r["n_tokens"], r["margin_micro"], r["margin"])
        for r in linear_text_classifier(
            docs, synthetic_weights(spark, D), num_buckets=D
        ).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in re.split(r"[^a-z0-9]+", (row["text"] or "").lower()) if w]
        micro = sum(py_weight(py_bucket(w)) for w in words)
        assert out[row["doc_id"]] == (
            len(words),
            micro,
            round(micro / MICRO, 9),
        )


def test_zero_token_docs_get_bias_only_margin(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "!!!")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["margin_micro"])
        for r in linear_text_classifier(
            df, synthetic_weights(spark, D), num_buckets=D, bias_micro=250_000
        ).collect()
    }
    assert out[2] == (0, 250_000)
    assert out[3] == (0, 250_000)
    assert out[1][0] == 2


def test_missing_buckets_score_zero(spark):
    """A partial weight table (e.g. pruned model) must not drop tokens
    or null the margin — absent buckets contribute 0."""
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    empty_w = spark.createDataFrame([], "bucket long, w_micro long")
    out = linear_text_classifier(df, empty_w, num_buckets=D).collect()[0]
    assert (out["n_tokens"], out["margin_micro"], out["margin"]) == (2, 0, 0.0)


def test_plan_broadcasts_weights_and_has_no_python_eval(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        linear_text_classifier(docs, synthetic_weights(spark, D), num_buckets=D)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
