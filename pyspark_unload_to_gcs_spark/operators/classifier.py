"""Hashed-feature linear text classifier scoring (fasttext-style).

The standard production corpus filter (CCNet / the LLaMA wiki-ref
quality classifier shape): tokens -> hashing-trick feature buckets ->
sparse dot product with a weight vector -> per-document margin. Models
are trained OFFLINE (that is an ML problem, not a data-plane one);
this operator is the 100 TB *scoring* pass, expressed so every hot
step is a builtin JVM expression.

Scale design:

- **Feature hashing is engine-native and cross-engine exact**: bucket
  = first-32-bits-of-md5(token) mod num_buckets via ``conv(substring(
  md5(tok), 1, 8), 16, 10)`` — the identical integer falls out of
  DuckDB's shift-based hex parse and Python's ``int(hexdigest[:8],
  16)``, so classifier outputs are value-oracle-able (same posture as
  the md5 content hashes; Spark's xxhash64 would be faster but is not
  replayable cross-engine, and md5 here runs once per token).
- **Weights live in integer micro-units** (``w_micro`` BIGINT, 1e-6
  weight units). The per-document accumulation is exact BIGINT
  arithmetic — no float summation-order drift between partial and
  final aggregation, between runs, or between engines — and the
  margin materializes with ONE final division (lore #14 shape).
- **Join-then-regroup, not a map-side literal.** The weight table
  (num_buckets rows — a few MB even at 2^20 buckets) broadcast-joins
  the exploded (doc, bucket) stream; per-doc partial aggregation
  collapses the stream back to ~one row per document BEFORE the
  shuffle (a document's tokens are co-located in its input partition),
  so shuffle volume is O(documents), never O(tokens). Beyond broadcast
  size the join degrades to a bucket-key shuffle join, which is the
  right plan there.
- Zero-token documents are preserved with the bias-only margin via the
  pre-aggregated left join (same contract as ``bpe_encode_counts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.operators.text import words_col

MICRO = 1_000_000


def token_bucket(token, num_buckets: int):
    """Hashing-trick feature bucket of a token column: the first 32
    bits of md5 (8 hex chars) parsed base-16, mod ``num_buckets``.
    Deterministic, uniform, and replayable in DuckDB/Python."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long") % num_buckets


def synthetic_weights(spark, num_buckets: int) -> DataFrame:
    """Deterministic stand-in weight table ``(bucket, w_micro)`` for
    demos/tests where no offline-trained model exists: a Knuth
    multiplicative scramble of the bucket id mapped onto
    [-500001, 499999] micro-units. Real use passes a trained table of
    the same shape."""
    return spark.range(num_buckets).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % F.lit(1000003) - F.lit(500001)).alias(
            "w_micro"
        ),
    )


def linear_text_classifier(
    df: DataFrame,
    weights: DataFrame,
    *,
    num_buckets: int,
    text_column: str = "text",
    id_column: str = "doc_id",
    bias_micro: int = 0,
) -> DataFrame:
    """Score every document with a hashed-bucket linear model:
    ``(id, n_tokens, margin_micro, margin)`` where ``margin_micro =
    bias + sum(w_micro[bucket(token)])`` over the document's tokens
    (exact BIGINT) and ``margin = margin_micro / 1e6`` (the one
    division). Thresholding on the margin is equivalent to
    thresholding the sigmoid probability (monotone); apply
    ``F.expr("1/(1+exp(-margin))")`` downstream if calibrated
    probabilities are needed. Buckets absent from the weight table
    score 0 (coalesced left join), so partial vocabularies are safe."""
    toks = df.select(
        F.col(id_column),
        F.explode(words_col(F.col(text_column))).alias("token"),
    ).select(
        id_column, token_bucket(F.col("token"), num_buckets).alias("bucket")
    )
    # no explicit broadcast hint: a hint is always honored and would
    # force-collect a production-scale trained table to the driver; AQE
    # broadcasts the weight side while it is under the threshold and
    # degrades to the bucket-key shuffle join beyond it — exactly the
    # documented behavior (same posture as bpe_encode_counts)
    per_doc = (
        toks.join(weights, "bucket", "left")
        .groupBy(id_column)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("w_micro", F.lit(0))).alias("sum_micro"),
        )
    )
    return (
        df.select(id_column)
        .join(per_doc, id_column, "left")
        .select(
            F.col(id_column),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            (F.coalesce("sum_micro", F.lit(0)) + F.lit(int(bias_micro)))
            .cast("long")
            .alias("margin_micro"),
        )
        .withColumn(
            "margin",
            F.round(F.col("margin_micro").cast("double") / MICRO, 9),
        )
    )
