"""Oracle parity for the STAGED (r05) registry entries — same harness
as the live registry, so rotation next round is a mechanical move."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark import registry_staged
from tests.oracle_harness import assert_matches, duckdb_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck_mid(sf_dir_mid):
    con = duckdb_connection(sf_dir_mid)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry_staged.staged_oracle_sql()))
def test_staged_query_matches_oracle(spark, sf_dir, duck, name):
    q = registry_staged.staged_queries()[name]
    oracle = registry_staged.staged_oracle_sql()[name]
    assert_matches(q(spark, sf_dir), duck, oracle, name=name)


@pytest.mark.parametrize("name", sorted(registry_staged.staged_oracle_sql()))
def test_staged_query_matches_oracle_mid_sf(
    spark, sf_dir_mid, duck_mid, name
):
    """The driver-scale (sf0.01) arm of the staged parity claim: the
    rotation plan's "parity-green at sf0.001+sf0.01" was previously
    continuous only at sf0.001 (the sf0.01 leg ran in manual sittings);
    now both legs live in the suite (r14)."""
    q = registry_staged.staged_queries()[name]
    oracle = registry_staged.staged_oracle_sql()[name]
    assert_matches(q(spark, sf_dir_mid), duck_mid, oracle, name=name)


def test_staged_names_do_not_collide_with_live_registry():
    from pyspark_unload_to_gcs_spark import registry

    live = set(registry.queries())
    assert not (set(registry_staged.staged_queries()) & live)


def test_staged_repetition_oracle_multiline_parity(spark):
    """The fixture's docs are single-line, so the dup-line branch of
    the gopher_repetition oracle is only trivially exercised there —
    this pins Spark-vs-DuckDB parity on synthetic multi-line and
    repetitive docs (the branch that caught DuckDB's list_position
    returning 0, not NULL, for absent elements)."""
    import duckdb
    import pandas as pd

    from pyspark_unload_to_gcs_spark.operators.quality_filters import (
        gopher_repetition_profile,
    )
    from pyspark_unload_to_gcs_spark.registry_staged import _REP_SQL
    from tests.oracle_harness import assert_matches

    rows = [
        (1, "same line here\nanother line\nsame line here\nthird line other"),
        (2, " ".join(["buy now"] * 30)),
        (3, "one two three four five six seven eight nine ten"),
        (4, "a b\na b\na b\na b"),
        (5, ""),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)

    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_repetition_profile(sdf)
    frac_cols = [c for c in out.columns if c.endswith("_frac")]
    from pyspark.sql import functions as FF

    out = out.select(
        "doc_id",
        *[FF.round(FF.col(c), 9).alias(c) for c in frac_cols],
        "repetition_ok",
    )
    assert_matches(out, con, _REP_SQL, name="gopher_repetition_multiline")


def test_bpe_oracle_survives_training_exhaustion(spark):
    """If training exhausts before _BPE_MERGES merges (degenerate
    corpus), the unrolled replay's per-step CTE must become a no-op —
    an unguarded CROSS JOIN against the empty top-1 frame would delete
    every word state and zero the counts (review finding). The corpus
    here supports only 3 merges; both BPE oracles must still match."""
    import duckdb
    import pandas as pd

    from pyspark_unload_to_gcs_spark.operators.bpe import bpe_encode_counts, bpe_train
    from pyspark_unload_to_gcs_spark.registry_staged import (
        _BPE_COUNTS_SQL,
        _BPE_TRAIN_SQL,
    )
    from tests.oracle_harness import assert_matches

    rows = [(1, "ab ab"), (2, "ab"), (3, "")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    docs = spark.createDataFrame(pdf)

    merges = bpe_train(docs, num_merges=8, with_counts=True)
    # exhausts after (a,b) then (ab,</w>): every word is one symbol
    assert len(merges) == 2
    merge_rows = [(i + 1, a, b, int(c)) for i, (a, b, c) in enumerate(merges)]
    train_df = spark.createDataFrame(
        merge_rows, "rank bigint, a string, b string, pair_count bigint"
    )
    assert_matches(train_df, con, _BPE_TRAIN_SQL, name="bpe_train_exhausted")

    counts = bpe_encode_counts(docs, [(a, b) for a, b, _ in merges])
    assert_matches(counts, con, _BPE_COUNTS_SQL, name="bpe_counts_exhausted")
    con.close()


def test_repeated_span_dedup_vertical_tab_parity(spark):
    """Regression for the r06 advice finding: Java ``\\s`` includes
    U+000B (vertical tab) while RE2's does not, so tokenizing with
    ``\\s+`` on the Spark side and ``\\s+`` on the DuckDB side diverges
    on VT-bearing text. Both sides now use the explicit class
    ``[ \\t\\n\\x0B\\f\\r]+``; this pins parity on documents where VT
    actually separates tokens inside a repeated span."""
    import duckdb
    import pandas as pd

    from pyspark_unload_to_gcs_spark.operators.dedup import repeated_span_dedup
    from pyspark_unload_to_gcs_spark.registry_staged import _SPAN_DEDUP_SQL
    from tests.oracle_harness import assert_matches

    span = "w1 w2\x0bw3 w4 w5\x0bw6 w7 w8 w9 w10"  # 10 tokens iff VT splits
    rows = [
        (1, f"lead {span} tail1"),
        (2, f"{span} other trailing words here"),
        (3, "unique\x0btext with no repeated ten token span at all"),
        (4, ""),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)

    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_span_dedup(sdf, span_tokens=10, min_repeats=2)
    assert_matches(out, con, _SPAN_DEDUP_SQL, name="repeated_span_dedup_vt")
    # the repeated 10-token windows must actually have been detected
    # (i.e. VT really tokenized): docs 1 and 2 lose the shared span
    got = {r["doc_id"]: r["n_tokens_removed"] for r in out.collect()}
    assert got[1] >= 10 and got[2] >= 10 and got[3] == 0
