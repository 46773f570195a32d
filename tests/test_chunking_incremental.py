"""Unit tests: document chunking, incremental aggregate-state
maintenance, and range-clustered writes."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pyspark_unload_to_gcs_spark.operators.incremental import (
    aggregate_state,
    finalize_state,
    merge_aggregate_states,
)
from pyspark_unload_to_gcs_spark.operators.text import chunk_documents
from pyspark_unload_to_gcs_spark.sinks.writers import clustered_frame, write_clustered
from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_windows_cover_all_tokens_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(40))  # 40 tokens, size 8 stride 4
    out = chunk_documents(
        _docs(spark, [(1, text)]), chunk_size=8, stride=4
    ).collect()
    # starts at 0,4,...,36 -> 10 chunks
    assert [r.start for r in out] == list(range(0, 40, 4))
    assert [r.chunk_idx for r in out] == list(range(10))
    full = out[0]
    assert full.n_tokens == 8 and full.chunk_text == " ".join(f"w{i}" for i in range(8))
    # consecutive chunks overlap by size - stride = 4 tokens
    assert out[1].chunk_text.split()[:4] == out[0].chunk_text.split()[4:]
    # boundary chunk is short, never padded
    last = out[-1]
    assert last.start == 36 and last.n_tokens == 4
    # every token appears in ceil(8/4)=2 chunks except the first/last stride
    from collections import Counter

    seen = Counter(tok for r in out for tok in r.chunk_text.split())
    assert seen[f"w{20}"] == 2 and seen["w0"] == 1


def test_chunk_empty_and_whitespace_documents_survive(spark):
    out = chunk_documents(
        _docs(spark, [(1, ""), (2, "   "), (3, "one")]), chunk_size=8, stride=4
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 3  # one (empty) chunk each — no silent row loss
    assert by_id[1].n_tokens == 0 and by_id[1].chunk_text == ""
    assert by_id[2].n_tokens == 0
    assert by_id[3].n_tokens == 1 and by_id[3].chunk_text == "one"


def test_chunk_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_size=0, stride=4)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_size=4, stride=-1)


def test_chunking_is_narrow_no_shuffle(spark, sf_dir):
    df = chunk_documents(load_parquet(spark, f"{sf_dir}/documents.parquet"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_incremental_merge_equals_one_shot_any_split(spark, sf_dir):
    """Splitting the input at ANY boundary and merging the partial
    states must equal the one-shot aggregation (associativity), even
    merging out of order."""
    ev = load_parquet(spark, f"{sf_dir}/events.parquet")
    keys = ["event_type"]
    expected = {
        tuple(r) for r in finalize_state(aggregate_state(ev, keys, "value"), keys).collect()
    }
    thirds = [
        ev.filter(F.col("user_id") % 3 == i) for i in range(3)
    ]
    states = [aggregate_state(t, keys, "value") for t in thirds]
    for order in ([0, 1, 2], [2, 0, 1]):
        merged = merge_aggregate_states([states[i] for i in order], keys)
        assert {tuple(r) for r in finalize_state(merged, keys).collect()} == expected


def test_incremental_merge_handles_disjoint_keys(spark):
    a = spark.createDataFrame([("x", 1.0), ("x", 3.0)], "k string, v double")
    b = spark.createDataFrame([("y", 5.0)], "k string, v double")
    merged = finalize_state(
        merge_aggregate_states(
            [aggregate_state(a, ["k"], "v"), aggregate_state(b, ["k"], "v")], ["k"]
        ),
        ["k"],
    ).collect()
    got = {r.k: (r.n_rows, r.total, r.min_value, r.max_value, r.avg_value) for r in merged}
    assert got == {"x": (2, 4.0, 1.0, 3.0, 2.0), "y": (1, 5.0, 5.0, 5.0, 5.0)}


def test_clustered_write_files_have_disjoint_key_ranges(spark, sf_dir, tmp_path):
    """Each output file must cover a narrow slice of the cluster key:
    per-file [min, max] ranges must not overlap (this is what makes
    min/max-stat file skipping effective on the exported data)."""
    orders = load_parquet(spark, f"{sf_dir}/orders.parquet")
    plan = clustered_frame(orders, ["o_orderkey"], num_partitions=4)
    assert "rangepartitioning" in plan._jdf.queryExecution().executedPlan().toString()

    path = str(tmp_path / "clustered")
    write_clustered(orders, path, ["o_orderkey"], num_partitions=4)
    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        t = pq.read_table(f, columns=["o_orderkey"])["o_orderkey"].to_pylist()
        if t:
            ranges.append((min(t), max(t)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges ({lo1},{hi1}) vs ({lo2},{hi2})"
    # nothing lost
    total = sum(
        pq.read_table(f).num_rows for f in glob.glob(f"{path}/part-*.parquet")
    )
    assert total == orders.count()


def test_schema_evolution_merge_union_conform(spark, tmp_path):
    """Evolving source schemas: v1 files lack a column v2 adds.
    mergeSchema read yields the superset with NULLs; union_evolved
    aligns by name; conform_to_schema pins every window to one stable
    output schema."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from pyspark_unload_to_gcs_spark.sources.catalog import (
        conform_to_schema,
        load_parquet_evolved,
        union_evolved,
    )

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
    v2 = spark.createDataFrame([(3, "c", 1.5)], "id bigint, name string, score double")
    v1.write.mode("append").parquet(path)
    v2.write.mode("append").parquet(path)

    merged = load_parquet_evolved(spark, path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[3] == 1.5

    unioned = union_evolved([v1, v2])
    assert set(unioned.columns) == {"id", "name", "score"}
    assert unioned.count() == 3

    target = StructType(
        [
            StructField("id", LongType()),
            StructField("score", DoubleType()),
            StructField("grade", StringType()),  # not in any source -> NULL
        ]
    )
    conformed = conform_to_schema(v1, target)
    assert conformed.columns == ["id", "score", "grade"]
    assert conformed.schema == target
    assert {tuple(r) for r in conformed.collect()} == {(1, None, None), (2, None, None)}


def test_zorder_files_are_narrow_in_every_dimension(spark, sf_dir, tmp_path):
    """Z-order vs 1-d clustering on (o_custkey, o_totalprice): 1-d
    clustering leaves each file spanning ~the full price range, while
    Z-order files must be narrow in BOTH dimensions — the property that
    lets min/max stats skip files for predicates on either column."""
    from pyspark_unload_to_gcs_spark.sinks.writers import write_clustered, write_zordered

    orders = load_parquet(spark, f"{sf_dir}/orders.parquet")
    lo_k, hi_k, lo_p, hi_p = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_totalprice"), F.max("o_totalprice")
    ).first()

    def file_fracs(path):
        fracs = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            t = pq.read_table(f, columns=["o_custkey", "o_totalprice"])
            ck, tp = t["o_custkey"].to_pylist(), t["o_totalprice"].to_pylist()
            if ck:
                fracs.append(
                    (
                        (max(ck) - min(ck)) / (hi_k - lo_k),
                        (max(tp) - min(tp)) / (hi_p - lo_p),
                    )
                )
        return fracs

    zpath = str(tmp_path / "zorder")
    cpath = str(tmp_path / "clustered1d")
    write_zordered(orders, zpath, ["o_custkey", "o_totalprice"], num_partitions=16)
    write_clustered(orders, cpath, ["o_custkey"], num_partitions=16)

    zfracs = file_fracs(zpath)
    cfracs = file_fracs(cpath)
    assert len(zfracs) >= 8
    zk = sum(f[0] for f in zfracs) / len(zfracs)
    zp = sum(f[1] for f in zfracs) / len(zfracs)
    ck_ = sum(f[0] for f in cfracs) / len(cfracs)
    cp = sum(f[1] for f in cfracs) / len(cfracs)
    # 1-d: narrow in the cluster key, ~full range in price
    assert ck_ < 0.35 and cp > 0.8
    # z-order: meaningfully narrow in BOTH dims
    assert zk < 0.6 and zp < 0.6, (zk, zp)
    # no row loss
    total = sum(pq.read_table(f).num_rows for f in glob.glob(f"{zpath}/part-*.parquet"))
    assert total == orders.count()
    # schema untouched (no __zkey leak)
    assert "__zkey" not in pq.read_schema(glob.glob(f"{zpath}/part-*.parquet")[0]).names


def test_ngram_contamination_planted_overlap(spark):
    from pyspark_unload_to_gcs_spark.operators.text import ngram_contamination

    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            (1, "intro text then the quick brown fox jumps over something else"),
            (2, "completely unrelated words appear in this document here"),
            (3, "tiny doc"),  # < 5 tokens -> zero grams, must survive with 0/0
        ],
    )
    out = {r.doc_id: (r.n_grams, r.n_contaminated) for r in
           ngram_contamination(corpus, bench, n=5).collect()}
    assert out[1][0] == 7 and out[1][1] == 2  # "the quick brown fox jumps", "quick brown fox jumps over"
    assert out[2] == (4, 0)  # 8 tokens -> 4 grams, none shared
    assert out[3] == (0, 0)


def test_redact_pii_patterns(spark):
    from pyspark_unload_to_gcs_spark.operators.text import redact_pii

    rows = _docs(
        spark,
        [
            (1, "mail me at a.b+c@d-corp.example.org today"),
            (2, "see https://x.io/p?q=1#frag and http://y.z/path"),
            (3, "call +1 (555) 010-7788 now"),
            (4, "clean text stays untouched"),
        ],
    ).select("doc_id", redact_pii(F.col("text")).alias("t"))
    got = {r.doc_id: r.t for r in rows.collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert got[2] == "see <URL> and <URL>"
    assert got[3] == "call <PHONE> now"
    assert got[4] == "clean text stays untouched"


def test_pack_documents_bins_respect_budget_semantics(spark):
    from pyspark_unload_to_gcs_spark.operators.text import pack_documents

    # doc i has i+1 tokens; shard = doc_id % 2
    docs = _docs(spark, [(i, " ".join(["w"] * (i + 1))) for i in range(8)])
    out = {r.doc_id: r for r in
           pack_documents(docs, token_budget=10, n_shards=2).collect()}
    # shard 0: docs 0(1),2(3),4(5),6(7) -> pre-sums 0,1,4,9 -> bins 0,0,0,0
    assert [out[i].bin_id for i in (0, 2, 4, 6)] == [0, 0, 0, 0]
    assert [out[i].bin_offset for i in (0, 2, 4, 6)] == [0, 1, 4, 9]
    # shard 1: docs 1(2),3(4),5(6),7(8) -> pre 0,2,6,12 -> bins 0,0,0,1
    assert [out[i].bin_id for i in (1, 3, 5, 7)] == [0, 0, 0, 1]
    assert out[7].bin_offset == 2
    # start-offset binning: a doc belongs to the bin its first token falls in
    assert all(r.bin_offset < 10 for r in out.values())


def test_topk_state_any_split_associativity(spark, sf_dir):
    import os

    from pyspark_unload_to_gcs_spark.operators.incremental import (
        finalize_topk,
        merge_topk_states,
        topk_state,
    )
    from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet

    ev = load_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    keys, k = ["event_type"], 3

    def result(frames):
        merged = merge_topk_states(
            [topk_state(f, keys, "value", "event_id", k) for f in frames], keys, k
        )
        return sorted(tuple(r) for r in finalize_topk(merged, keys).collect())

    direct = result([ev])
    # 2-way and 3-way splits on unrelated predicates must merge identically
    two = result([ev.filter("user_id % 2 = 0"), ev.filter("user_id % 2 = 1")])
    three = result([ev.filter("event_id % 3 = 0"), ev.filter("event_id % 3 = 1"),
                    ev.filter("event_id % 3 = 2")])
    assert direct == two == three
    # rank 1 really is the per-key max
    mx = {r.event_type: r.mx for r in
          ev.groupBy("event_type").agg(F.max("value").alias("mx")).collect()}
    for row in [t for t in direct if t[1] == 1]:
        assert row[3] == mx[row[0]]
