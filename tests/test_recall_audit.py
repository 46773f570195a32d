"""Brute-force recall audits for the bucketed approximate operators.

Motivated by the round-4 minhash-mask bug: a silently-degenerate hash
family passed every planted-pair test (aligned positions) while recall
on shifted near-dups was ruined. These audits compare each bucketed
candidate path against a brute-force reference over the whole sf0.001
fixture, so a structural recall collapse — not just a planted-case
failure — turns pytest red.

Precision is exact by construction everywhere (candidates are verified
with the exact measure before use), so the audits assert BOTH:
  - subset: reported pairs/losers are a subset of the brute-force set;
  - recall: the fraction of brute-force pairs found meets the bound the
    banding math promises (with margin for fixture regeneration).
"""

from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.operators import dedup as D

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _load_docs(spark):
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    return load_parquet(spark, DOCS)


def test_simhash_banding_finds_every_hamming3_pair(spark):
    """The 4-band pigeonhole is EXACT for hamming <= 3 (any pair within
    bands-1 bit flips shares one untouched 16-bit chunk), so the
    operator's dropped set must equal the brute-force dropped set."""
    docs = _load_docs(spark)
    hashed = docs.select(
        F.col("doc_id"), D.simhash_column("text").alias("h")
    ).collect()
    sims = [(r.doc_id, r.h) for r in hashed]
    brute_losers = set()
    for i in range(len(sims)):
        for j in range(i + 1, len(sims)):
            a, b = sims[i], sims[j]
            if bin((a[1] ^ b[1]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3:
                brute_losers.add(max(a[0], b[0]))
    survivors = {r.doc_id for r in D.simhash_dedup(docs, "doc_id", "text").select("doc_id").collect()}
    all_ids = {s[0] for s in sims}
    op_losers = all_ids - survivors
    assert op_losers == brute_losers


def test_minhash_8band_recall_against_bruteforce_jaccard(spark):
    """Standard 8-band/r=4 LSH vs brute-force shingle Jaccard >= 0.8:
    reported pairs must be a subset (exact verify) and recall must meet
    the banding bound. The fixture's near-dup pairs sit at J >= 0.9
    where per-pair catch probability is 1-(1-J^4)^8 >= 0.9998, so an
    aggregate floor of 0.9 has enormous margin — it fails only on a
    structural collapse like the r1-r3 mask bug (recall there: this
    test's brute-force set included shifted pairs the broken family
    could not see)."""
    docs = _load_docs(spark)
    sig = D.minhash_signatures(docs, "doc_id", "text").persist()
    sig.count()
    sh = {r["__id"]: set(r["__sh"]) for r in sig.select("__id", "__sh").collect()}
    ids = sorted(sh)
    brute = set()
    for i in range(len(ids)):
        a = ids[i]
        sa = sh[a]
        for j in range(i + 1, len(ids)):
            b = ids[j]
            sb = sh[b]
            union = len(sa | sb)
            if union and len(sa & sb) / union >= 0.8:
                brute.add((a, b))
    found = {
        (r.id_a, r.id_b)
        for r in D.minhash_candidate_pairs(
            docs, "doc_id", "text", signatures=sig
        ).collect()
    }
    sig.unpersist()
    assert found <= brute, f"false positives (verify broken): {found - brute}"
    if brute:
        recall = len(found & brute) / len(brute)
        assert recall >= 0.9, f"LSH recall collapsed: {recall} over {len(brute)} pairs"


def test_embedding_ann_join_subset_and_planted_recall(spark):
    """ann_join (single-bucket sign-LSH) vs brute-force cosine: found
    pairs must be a subset of the true >=threshold pair set, and an
    IDENTICAL planted vector must always be found (identical vectors
    share every bucket deterministically — recall 1 at cosine 1)."""
    from pyspark_unload_to_gcs_spark.operators.similarity import ann_join
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    import numpy as np

    emb = load_parquet(spark, EMB)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(ids), k=1)
    true_pairs = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(*iu)
        if cos[i, j] >= 0.95
    }
    # plant an exact duplicate of the first vector under a fresh id
    dup = spark.createDataFrame(
        [(999001, [float(x) for x in rows[0].embedding])],
        "vec_id bigint, embedding array<float>",
    )
    both = emb.select("vec_id", "embedding").unionByName(dup)
    found = {
        (int(min(r.id_a, r.id_b)), int(max(r.id_a, r.id_b)))
        for r in ann_join(
            both, both, dim=mat.shape[1], cosine_threshold=0.95
        ).collect()
    }
    planted = (int(rows[0].vec_id), 999001)
    assert planted in found, "identical planted vector not found — bucketing broken"
    found_real = {p for p in found if 999001 not in p}
    assert found_real <= true_pairs, f"false positives: {found_real - true_pairs}"


def test_ann_index_match_planted_recall_and_param_guard(spark):
    """ann_match_against_index: an exact duplicate of an index vector
    must always match (identical vectors share every bucket under the
    seeded planes), matches must be subset-correct vs brute force, and
    a plane-family mismatch between index build and call must raise
    instead of silently returning zero recall."""
    import numpy as np
    import pytest as _pytest

    from pyspark_unload_to_gcs_spark.operators.similarity import (
        ann_match_against_index,
        with_lsh_bucket,
    )
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    emb = load_parquet(spark, EMB).select("vec_id", "embedding")
    rows = emb.collect()
    dim = len(rows[0].embedding)
    index = with_lsh_bucket(emb, dim=dim)

    # new batch: exact duplicates of every 3rd vector, re-keyed
    new_batch = emb.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding"
    )
    out = ann_match_against_index(
        new_batch, index, dim=dim, cosine_threshold=0.95
    ).collect()
    found = {(int(r.new_id), int(r.index_id)) for r in out}
    planted = {
        (int(r.vec_id) + 500000, int(r.vec_id)) for r in rows if r.vec_id % 3 == 0
    }
    assert planted <= found, "planted exact duplicates missed — bucketing broken"

    # subset-correctness: every reported pair really is >= threshold
    mat = {int(r.vec_id): np.array(list(r.embedding), dtype=np.float64) for r in rows}
    for new_id, index_id in found:
        a, b = mat[new_id - 500000], mat[index_id]
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert c >= 0.95 - 1e-9, (new_id, index_id, c)

    # param guard: index bucketed with different planes must be refused
    with _pytest.raises(ValueError, match="bucket spaces would be disjoint"):
        ann_match_against_index(new_batch, index, dim=dim, seed=43)
    with _pytest.raises(ValueError, match="lsh_bucket"):
        ann_match_against_index(new_batch, emb, dim=dim)


def test_semantic_cluster_dedup_subset_and_planted_recall(spark):
    """semantic_cluster_dedup (k-means-cell blocking) vs brute-force:
    dropped ids must be exactly the ids the brute-force >=threshold
    pair relation would drop WITHIN the operator's cells (precision is
    exact by construction), and an IDENTICAL planted vector must always
    be dropped — identical vectors produce identical per-centroid
    scores, so they deterministically share a cell (recall 1 at
    cosine 1, structurally)."""
    from pyspark_unload_to_gcs_spark.operators.similarity import semantic_cluster_dedup
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    emb = load_parquet(spark, EMB).select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    uni = emb.unionByName(planted)
    survivors = {
        r.vec_id
        for r in semantic_cluster_dedup(
            uni, n_centroids=8, cosine_threshold=0.95
        ).collect()
    }
    n_base = emb.count()
    n_planted = planted.count()
    # every planted exact copy (larger id, same cell, cosine 1) dropped
    dropped = {r.vec_id for r in uni.collect()} - survivors
    planted_ids = {r.vec_id for r in planted.collect()}
    assert planted_ids <= dropped, "exact planted copies survived — cell blocking broken"
    # no false drops: the raw fixture has no >=0.95 pair (max cosine
    # ~0.51 — see embedding_near_dedup docstring), so nothing else may go
    assert dropped == planted_ids
    assert len(survivors) == n_base
    assert n_planted == len(planted_ids)


def test_bucket_cap_drops_heavy_buckets_and_keeps_small_ones(spark):
    """bucket_cap is the shared-vocabulary scale lever (SCALE_AUDIT.md):
    a planted crowd of docs sharing one popular shingle floods one band
    bucket; with a cap below the crowd size those quadratic candidates
    vanish, while an unrelated small-bucket near-dup pair is still
    found. Uncapped, the crowd pairs ARE found (they are true
    near-dups here) — the cap trades exactly that bucket's recall."""
    crowd = [(i, "alpha beta gamma delta epsilon zeta") for i in range(100, 140)]
    pair = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "one two three four five six seven eight nine ten eleven"),
    ]
    df = spark.createDataFrame(crowd + pair, "doc_id long, text string")
    uncapped = D.minhash_candidate_pairs(df, "doc_id", "text", jaccard_threshold=0.8)
    got_unc = {(r.id_a, r.id_b) for r in uncapped.collect()}
    crowd_pairs = {(a, b) for a in range(100, 140) for b in range(a + 1, 140)}
    assert (1, 2) in got_unc
    assert crowd_pairs <= got_unc  # identical texts: all true pairs found

    capped = D.minhash_candidate_pairs(
        df, "doc_id", "text", jaccard_threshold=0.8, bucket_cap=10
    )
    got_cap = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (1, 2) in got_cap, "small-bucket pair lost under an unrelated cap"
    assert not (crowd_pairs & got_cap), "capped bucket still produced pairs"


def test_semantic_dedup_auto_k_scales_centroids(spark):
    """n_centroids="auto" sizes the quantizer ~sqrt(n) (>= 16 floor) so
    within-cell pair mass grows n^1.5, not n^2; results on the planted
    fixture match the fixed-k run (exact duplicates land in their
    twin's cell under ANY quantizer — assignment is deterministic on
    identical vectors)."""
    from pyspark_unload_to_gcs_spark.operators.similarity import semantic_cluster_dedup
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    emb = load_parquet(spark, EMB).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    uni = emb.unionByName(planted)
    survivors = {
        r.vec_id
        for r in semantic_cluster_dedup(
            uni, n_centroids="auto", cosine_threshold=0.95
        ).collect()
    }
    planted_ids = {r.vec_id for r in planted.collect()}
    dropped = {r.vec_id for r in uni.collect()} - survivors
    assert dropped == planted_ids
