"""Scale-layout queries: physical-design operators for the 100 TB
posture — bucketed co-located joins, Z-order clustering for min/max
skipping, and incremental ANN ingestion against a bucketed vector
index. All three are fully deterministic and carry complete DuckDB
value oracles (the oracle replays the layout arithmetic; the physical
benefit — absent shuffles, pruned files — is asserted by plan/layout
tests in tests/test_bucketed.py and tests/test_layout.py).
"""

from __future__ import annotations

import tempfile
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.registry import _t, register
from pyspark_unload_to_gcs_spark.session import session_token
from pyspark_unload_to_gcs_spark.operators import similarity as S

# ---------------------------------------------------------------------------
# bucketed co-located join
# ---------------------------------------------------------------------------

_BUCKETED_MEMO: dict[tuple, tuple[str, str]] = {}


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders + customer as bucketed catalog tables ONCE per
    (session, sf_dir) — modeling the real flow where the bucketed write
    is a one-time layout cost amortized over every later join. Tables
    are external (path-backed) in a session temp dir."""
    key = (session_token(spark), sf_dir)
    if key not in _BUCKETED_MEMO:
        from pyspark_unload_to_gcs_spark.sources.bucketed import write_bucketed

        tag = zlib.crc32(sf_dir.encode()) & 0xFFFFFFFF
        base = tempfile.mkdtemp(prefix="eng_bucketed_")
        orders_t = f"eng_orders_by_custkey_{tag:08x}"
        customer_t = f"eng_customer_by_custkey_{tag:08x}"
        write_bucketed(
            _t(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
            ),
            orders_t,
            bucket_columns=["o_custkey"],
            num_buckets=8,
            path=f"{base}/orders",
        )
        write_bucketed(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment"),
            customer_t,
            bucket_columns=["c_custkey"],
            num_buckets=8,
            path=f"{base}/customer",
        )
        _BUCKETED_MEMO[key] = (orders_t, customer_t)
    return _BUCKETED_MEMO[key]


@register(
    "bucketed_colocated_join",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two bucketed tables on their shared bucket key (custkey, 8
    buckets each side): with matching bucket specs Spark plans the join
    with NO Exchange on either side — each task zips bucket i against
    bucket i (asserted with broadcast disabled in tests/test_bucketed.py).
    This is the answer to a repeated 100 TB fact-fact join: one bucketed
    write, then every nightly join on that key is shuffle-free. The
    oracle replays the join + rollup from the raw tables — bucketing
    must be a pure layout change, invisible in values."""
    orders_t, customer_t = _bucketed_tables(spark, sf_dir)
    joined = spark.table(orders_t).join(
        spark.table(customer_t),
        F.col("o_custkey") == F.col("c_custkey"),
        "inner",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("c_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------

_Z_BITS = 10
_Z_FILES = 16


def _zorder_sql(x: str, y: str, bits: int = _Z_BITS) -> str:
    """DuckDB replay of operators/layout.py interleave_bits (N=2): bit i
    of column j -> position i*2 + j (x is column 0, y column 1)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


@register(
    "zorder_layout",
    oracle=f"""
    WITH dims AS (
      SELECT user_id % 1024 AS ux,
             CAST(floor(value) AS BIGINT) % 1024 AS vb
      FROM events
    ), keyed AS (
      SELECT ux, vb, {_zorder_sql("ux", "vb")} >> {2 * _Z_BITS - 4} AS file_id
      FROM dims
    )
    SELECT file_id, COUNT(*) AS n_rows,
           MIN(ux) AS min_ux, MAX(ux) AS max_ux,
           MIN(vb) AS min_vb, MAX(vb) AS max_vb
    FROM keyed GROUP BY file_id
    """,
)
def zorder_layout_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering (operators/layout.py): events mapped to two
    integer dimensions (user bucket, value bucket), Morton-interleaved,
    and sliced into 16 z-range files; output is each file's bounding box
    over BOTH dimensions. The boxes are tight rectangles — the reason a
    filter on either dimension prunes most files via parquet min/max
    footers, which a single-column sort only achieves for one dimension.
    Bit arithmetic is replayed exactly in the oracle; the physical
    repartitionByRange+sort path is covered by tests/test_layout.py."""
    from pyspark_unload_to_gcs_spark.operators.layout import zorder_file_stats

    ev = _t(spark, sf_dir, "events")
    dims = ev.select(
        (F.col("user_id") % 1024).alias("ux"),
        (F.floor(F.col("value")).cast("long") % 1024).alias("vb"),
    )
    return zorder_file_stats(dims, ["ux", "vb"], bits=_Z_BITS, files=_Z_FILES)


# ---------------------------------------------------------------------------
# incremental ANN against a bucketed vector index
# ---------------------------------------------------------------------------

# SQL spellings shared with the ANN oracles in registry_extensions
from pyspark_unload_to_gcs_spark.registry_extensions import (  # noqa: E402
    _DOT,
    _plane_values_sql,
)


@register(
    "incremental_ann_match",
    # Full replay: the new batch (every 10th vector re-keyed +20000) is
    # derived in SQL, both sides' sign-LSH buckets recomputed from the
    # seeded plane literals, and Spark's exact fold-order cosine
    # reproduced by list_reduce (left fold).
    oracle=f"""
    WITH planes(b, p) AS (VALUES {_plane_values_sql()}),
    idx AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    newb AS (
      SELECT vec_id + 20000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    bidx AS (
      SELECT i.vec_id, i.v,
             CAST(SUM(CASE WHEN {_DOT.format(a="i.v", b="p.p")} >= 0 THEN 1 << p.b ELSE 0 END) AS BIGINT) AS bucket
      FROM idx i, planes p GROUP BY i.vec_id, i.v
    ),
    bnew AS (
      SELECT n.vec_id, n.v,
             CAST(SUM(CASE WHEN {_DOT.format(a="n.v", b="p.p")} >= 0 THEN 1 << p.b ELSE 0 END) AS BIGINT) AS bucket
      FROM newb n, planes p GROUP BY n.vec_id, n.v
    )
    SELECT n.vec_id AS new_id, i.vec_id AS index_id,
           round({_DOT.format(a="n.v", b="i.v")}
                 / (sqrt({_DOT.format(a="n.v", b="n.v")}) * sqrt({_DOT.format(a="i.v", b="i.v")})), 6) AS cosine_r
    FROM bnew n JOIN bidx i ON n.bucket = i.bucket
    WHERE {_DOT.format(a="n.v", b="i.v")}
          / (sqrt({_DOT.format(a="n.v", b="n.v")}) * sqrt({_DOT.format(a="i.v", b="i.v")})) >= 0.95
    """,
)
def incremental_ann_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous embedding ingestion (operators/similarity.py
    ann_match_against_index): the full embeddings table plays the
    bucketed index, every 10th vector re-keyed +20000 plays the incoming
    batch — the batch computes only its own bucket keys and equality-
    joins the index, never rescanning corpus vectors (at scale: index
    written partitioned by lsh_bucket, the join prunes partitions).
    Planted exact duplicates share every bucket deterministically, so
    the result is exactly one (new, original) pair per planted vector at
    cosine 1.0 — a recall break returns fewer rows and turns the driver
    row red. The embeddings twin of incremental_near_dedup."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = int(emb.select(F.size("embedding")).first()[0])
    index = S.with_lsh_bucket(emb, dim=dim)
    new_batch = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 20000).alias("vec_id"), "embedding"
    )
    out = S.ann_match_against_index(new_batch, index, dim=dim, cosine_threshold=0.95)
    return out.select("new_id", "index_id", F.round("cosine", 6).alias("cosine_r"))
