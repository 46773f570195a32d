"""Run every registered query against its DuckDB oracle at sf0.001 —
a local replica of the driver's t2 gate, so mismatches surface before
the driver runs them at sf0.01."""

import pytest

from pyspark_unload_to_gcs_spark import registry
from tests.oracle_harness import assert_matches, duckdb_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


ORACLE_KEYS = sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = registry.queries()[name]
    oracle = registry.oracle_sql()[name]
    assert_matches(q(spark, sf_dir), duck, oracle, name=name)


def test_every_query_runs_and_all_have_oracle_or_reason(spark, sf_dir):
    """Queries without an oracle (approximate ops) must still run and
    return a stable schema. Restricted to the NO-oracle rows (opt r16):
    every oracled query already executes and schema-validates in the
    parametrized parity test above, so re-running all 227 here was one
    290 s test duplicating the suite's own coverage — the suite's
    single biggest row in --durations."""
    oracled = set(registry.oracle_sql())
    for name, q in registry.queries().items():
        if name in oracled:
            continue
        df = q(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_embedding_dim_matches_ann_oracle_literals(spark, sf_dir):
    """The vector_topk_lsh/ivf oracles embed hyperplane literals for the
    fixture's embedding dimensionality; if the fixture regenerates with
    a different dim this must fail HERE, not as a silent driver-row
    mismatch."""
    from pyspark_unload_to_gcs_spark.registry import _t
    from pyspark_unload_to_gcs_spark.registry_extensions import _EMB_DIM

    import pyspark.sql.functions as F

    dims = (
        _t(spark, sf_dir, "embeddings")
        .select(F.size("embedding").alias("d"))
        .distinct()
        .collect()
    )
    assert [r.d for r in dims] == [_EMB_DIM]
