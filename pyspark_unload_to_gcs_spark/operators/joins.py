"""Join-side pruning for joins whose probe side is enormous and whose
build side is selective — the manual, plannable analogue of Spark's
runtime bloom-filter pushdown (``spark.sql.optimizer.runtime.
bloomFilter.enabled``, SPARK-32268).

``bucket_bloom_prune`` is a single-hash Bloom filter expressed as
relational algebra: the build side's keys hash into ``num_buckets``
buckets; the DISTINCT bucket set (at most ``num_buckets`` rows — a few
MB of longs even at 2^20) broadcasts; the probe side keeps only rows
whose key bucket appears in the set (a broadcast LEFT SEMI hash join —
one narrow pass over the probe, no shuffle of it). Guarantees:

- NO false negatives — every probe row that would join survives the
  prune (bucket(key) collides with itself), so the exact join after
  the prune returns exactly the unpruned join's rows;
- false-positive rate ~ |distinct build buckets| / num_buckets, the
  classic one-hash Bloom bound — size num_buckets ≳ 50x the build
  side's distinct keys for ~2% leakage.

Why not the AQE feature itself: the runtime filter only injects when
the optimizer's stats say so, and its decisions are not part of the
query's declared semantics. This operator is for the 100 TB pipeline
author who KNOWS the build side is selective (a vetted entity list, a
sampled audit cohort) and wants the prune guaranteed in the plan —
and, with ``method="md5"``, replayable cross-engine under a value
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_bucket(key: Column, num_buckets: int, *, method: str = "xxhash64") -> Column:
    """Deterministic bucket of a join key.

    - ``"xxhash64"`` (default): JVM-side 64-bit hash, the production
      path (cheapest per row; sign-safe via pmod).
    - ``"md5"``: first 32 md5 bits of the key's string form, the
      cross-engine-replayable path (operators/classifier.token_bucket
      spelling — one maintained DuckDB twin).

    NULL key -> NULL bucket under BOTH methods. xxhash64 alone would
    hash NULL to the seed's hash (a real, shareable bucket — ADVICE
    r11: NULL left keys leaked into the anti-join's hit branch and a
    NULL right key planted a permanent false-positive bucket), so the
    NULL case is guarded explicitly; md5(NULL) is already NULL."""
    if method == "xxhash64":
        return F.when(
            key.isNotNull(), F.pmod(F.xxhash64(key), F.lit(num_buckets))
        )
    if method == "md5":
        from pyspark_unload_to_gcs_spark.operators.classifier import token_bucket

        return token_bucket(key.cast("string"), num_buckets)
    raise ValueError(f"key_bucket: unknown method {method!r} ('xxhash64' or 'md5')")


def bucket_bloom_prune(
    probe: DataFrame,
    build: DataFrame,
    *,
    probe_key: str,
    build_key: str,
    num_buckets: int = 1 << 20,
    method: str = "xxhash64",
) -> DataFrame:
    """Probe rows surviving the build side's bucket filter (schema of
    ``probe``, unchanged). NULL probe keys are dropped — they cannot
    join, which is the only consumer this prune serves."""
    buckets = (
        build.select(
            key_bucket(F.col(build_key), num_buckets, method=method).alias("__bkt")
        )
        .filter(F.col("__bkt").isNotNull())
        .distinct()
    )
    return (
        probe.filter(F.col(probe_key).isNotNull())
        .withColumn(
            "__bkt", key_bucket(F.col(probe_key), num_buckets, method=method)
        )
        .join(F.broadcast(buckets), "__bkt", "left_semi")
        .drop("__bkt")
    )





def bucket_bloom_anti_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    num_buckets: int = 1 << 20,
    method: str = "xxhash64",
) -> DataFrame:
    """``left`` rows with NO match in ``right`` (exactly
    ``left.join(right, key, "left_anti")``), bloom-accelerated: a left
    row whose key bucket is ABSENT from the right side's bucket set is
    PROVABLY unmatched (no false negatives), so it passes through the
    narrow bucket semi/anti pair without ever reaching the exact
    anti-join — only the bucket-hit slice (matches + the ~|right
    buckets|/num_buckets false-positive band) pays it.

    Cost model, stated precisely (review r11): the union's two
    branches each scan the probe once (Spark does not share subplans
    across union branches), so this is TWO NARROW PROBE SCANS and a
    shuffle of only the small bucket-hit slice. When ``right`` fits a
    plain broadcast, a direct ``left_anti`` (one scan, zero shuffle)
    is strictly cheaper — use this operator for the 100 TB
    deletion-propagation shape where ``right`` is too big to broadcast
    but its BUCKET SET is not: the alternative there shuffles the
    entire probe, and two scans beat one full-table shuffle.

    NULL left keys never match in SQL anti-join semantics and are kept
    — their NULL bucket misses the set and they ride the pass-through
    branch. ``right``'s key is projected before the exact join, so
    ``left_key == right_key`` (the common shape) is not ambiguous."""
    buckets = (
        right.select(
            key_bucket(F.col(right_key), num_buckets, method=method).alias("__bkt")
        )
        .filter(F.col("__bkt").isNotNull())
        .distinct()
    )
    tagged = left.withColumn(
        "__bkt", key_bucket(F.col(left_key), num_buckets, method=method)
    )
    misses = tagged.join(F.broadcast(buckets), "__bkt", "left_anti")
    hits = tagged.join(F.broadcast(buckets), "__bkt", "left_semi")
    # project + rename the right key so the equality below is
    # dataframe-qualified even when left_key == right_key (review r11:
    # the unprojected form raised AMBIGUOUS_REFERENCE on the canonical
    # same-name anti-join)
    right_keys = right.select(F.col(right_key).alias("__rk"))
    survivors = hits.join(
        right_keys, hits[left_key] == right_keys["__rk"], "left_anti"
    )
    return misses.unionByName(survivors).drop("__bkt")

__all__ = ["key_bucket", "bucket_bloom_prune", "bucket_bloom_anti_join"]
