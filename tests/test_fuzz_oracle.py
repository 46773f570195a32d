"""Randomized oracle fuzzing: seeded random predicates/aggregations in
the Spark∩DuckDB SQL subset, executed by BOTH engines on the same
parquet and compared row-for-row (order-insensitive value hash via
oracle_harness). Catches dialect/semantics drift the hand-written
query suite doesn't reach — null comparison edges, modulo arithmetic,
string functions, AND/OR/NOT nesting.

Deterministic by construction (fixed seed, no hypothesis shrinking
needed: any failure reproduces by name)."""

from __future__ import annotations

import random

import pytest

from pyspark_unload_to_gcs_spark.sources.catalog import load_parquet
from tests.oracle_harness import assert_matches, duckdb_connection

SEED = 20260813
N_FILTERS = 20
N_AGGS = 8
N_JOINS = 10
N_WINDOWS = 6
N_SETOPS = 6
N_SCALARS = 8
N_EVENTS = 8
N_DOCS = 8
N_SUBQ = 8
N_ROLLUP = 6

# columns of `orders` usable identically in both dialects
NUM_COLS = ["o_orderkey", "o_custkey"]
DEC_COL = "o_totalprice"
STR_COLS = ["o_orderstatus", "o_orderpriority"]


def _predicate(rng: random.Random, depth: int = 0) -> str:
    kind = rng.choice(
        ["num_cmp", "mod", "str_eq", "str_in", "between", "not_null", "substr"]
        + (["and", "or", "not"] if depth < 2 else [])
    )
    if kind == "num_cmp":
        col = rng.choice(NUM_COLS + [DEC_COL])
        op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        lit = rng.choice([0, 1, 7, 500, 1499, 75000, 150000])
        return f"{col} {op} {lit}"
    if kind == "mod":
        col = rng.choice(NUM_COLS)
        k = rng.choice([2, 3, 7, 10])
        return f"{col} % {k} = {rng.randrange(k)}"
    if kind == "str_eq":
        col = rng.choice(STR_COLS)
        lit = rng.choice(["O", "F", "P", "1-URGENT", "3-MEDIUM", "5-LOW", ""])
        return f"{col} {rng.choice(['=', '!='])} '{lit}'"
    if kind == "str_in":
        return f"o_orderstatus IN ({rng.choice([chr(39) + 'O' + chr(39), chr(39) + 'O' + chr(39) + ', ' + chr(39) + 'F' + chr(39)])})"
    if kind == "between":
        lo = rng.choice([0, 100, 10000])
        hi = lo + rng.choice([50, 5000, 100000])
        return f"{rng.choice(NUM_COLS + [DEC_COL])} BETWEEN {lo} AND {hi}"
    if kind == "not_null":
        return f"{rng.choice(STR_COLS + NUM_COLS)} IS NOT NULL"
    if kind == "substr":
        return f"substring(o_orderpriority, 1, 1) = '{rng.randrange(1, 6)}'"
    if kind == "not":
        return f"NOT ({_predicate(rng, depth + 1)})"
    a, b = _predicate(rng, depth + 1), _predicate(rng, depth + 1)
    return f"({a}) {kind.upper()} ({b})"


def _agg_sql(rng: random.Random) -> str:
    group = rng.choice(STR_COLS)
    pred = _predicate(rng)
    return f"""
    SELECT {group},
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           MIN(o_orderkey) AS min_key,
           MAX(o_custkey) AS max_cust
    FROM orders WHERE {pred} GROUP BY {group}
    """


def _filter_sql(rng: random.Random) -> str:
    pred = _predicate(rng)
    return f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders WHERE {pred}
    """


def _cust_predicate(rng: random.Random) -> str:
    kind = rng.choice(["bal", "seg", "mod", "null"])
    if kind == "bal":
        return f"c_acctbal {rng.choice(['<', '>', '<=', '>='])} {rng.choice([-500, 0, 1000, 5000])}"
    if kind == "seg":
        seg = rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])
        return f"c_mktsegment {rng.choice(['=', '!='])} '{seg}'"
    if kind == "mod":
        return f"c_nationkey % {rng.choice([2, 5])} = 0"
    return "c_name IS NOT NULL"


def _join_sql(rng: random.Random) -> str:
    """Random join fuzz: INNER/LEFT orders⋈customer with predicates on
    either side. COUNT(c_name) exercises outer-join NULL counting;
    aggregates stay exact (count / decimal sum / min / max)."""
    join_type = rng.choice(["JOIN", "LEFT JOIN"])
    where = _predicate(rng)
    if join_type == "JOIN" and rng.random() < 0.5:
        where = f"({where}) AND ({_cust_predicate(rng)})"
    group = rng.choice(STR_COLS)
    return f"""
    SELECT {group},
           COUNT(*) AS n,
           COUNT(c_name) AS n_matched,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           MIN(c_nationkey) AS min_nation
    FROM orders {join_type} customer ON o_custkey = c_custkey
    WHERE {where} GROUP BY {group}
    """


def _window_sql(rng: random.Random) -> str:
    """Deterministic window fuzz: frames ordered by the unique
    o_orderkey so ranking/offset results can't tie."""
    part = rng.choice(STR_COLS)
    direction = rng.choice(["ASC", "DESC"])
    fn = rng.choice(
        [
            "ROW_NUMBER() OVER w",
            f"LAG(o_orderkey) OVER w",
            f"LEAD(o_custkey) OVER w",
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER "
            "(PARTITION BY {p} ORDER BY o_orderkey {d} ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW) AS DOUBLE)",
        ]
    ).format(p=part, d=direction)
    pred = _predicate(rng)
    return f"""
    SELECT o_orderkey, {part}, {fn} AS w_val
    FROM orders WHERE {pred}
    WINDOW w AS (PARTITION BY {part} ORDER BY o_orderkey {direction})
    """


def _setop_sql(rng: random.Random) -> str:
    """Set-operation fuzz: UNION / UNION ALL / INTERSECT / EXCEPT over
    two differently-filtered projections of the same table. DISTINCT
    variants exercise Spark's HashAggregate-based dedup vs DuckDB's."""
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    cols = rng.choice(["o_orderstatus", "o_orderstatus, o_orderpriority", "o_custkey % 10 AS k"])
    a, b = _predicate(rng), _predicate(rng)
    return f"""
    SELECT {cols} FROM orders WHERE {a}
    {op}
    SELECT {cols} FROM orders WHERE {b}
    """


def _scalar_sql(rng: random.Random) -> str:
    """Scalar-expression fuzz over the shared function subset: string
    case/trim/concat/length, integer arithmetic, CASE, coalesce/nullif,
    greatest/least — projected per row (no aggregation masking)."""
    expr = rng.choice(
        [
            "upper(o_orderstatus) || '_' || lower(o_orderpriority)",
            "length(trim(o_orderpriority))",
            "abs(o_custkey - 750) + o_orderkey % 13",
            "CASE WHEN o_totalprice > 100000 THEN 'big' WHEN o_totalprice > 10000 THEN 'mid' ELSE 'small' END",
            "coalesce(nullif(o_orderstatus, 'O'), 'open')",
            "greatest(o_orderkey % 97, o_custkey % 89)",
            "least(length(o_orderpriority), o_orderkey % 7)",
            "replace(o_orderpriority, '-', ':')",
        ]
    )
    pred = _predicate(rng)
    return f"""
    SELECT o_orderkey, {expr} AS v FROM orders WHERE {pred}
    """


def _event_predicate(rng: random.Random) -> str:
    kind = rng.choice(["ts_cmp", "type_in", "value_range", "user_mod", "year_eq"])
    if kind == "ts_cmp":
        day = rng.randrange(1, 29)
        op = rng.choice(["<", ">=", ">", "<="])
        return f"ts {op} TIMESTAMP '2024-01-{day:02d} 12:00:00'"
    if kind == "type_in":
        types = rng.sample(["click", "view", "purchase", "signup", "error"], rng.randrange(1, 4))
        lits = ", ".join(f"'{x}'" for x in types)
        return f"event_type IN ({lits})"
    if kind == "value_range":
        lo = rng.choice([0, 10, 50])
        return f"value BETWEEN {lo} AND {lo + rng.choice([5, 40, 200])}"
    if kind == "user_mod":
        k = rng.choice([2, 5, 11])
        return f"user_id % {k} = {rng.randrange(k)}"
    return f"year(ts) = 2024 AND month(ts) = {rng.randrange(1, 13)}"


def _event_sql(rng: random.Random) -> str:
    """Timestamp fuzz over events: TIMESTAMP-literal bounds and
    year/month/day extraction in the shared dialect subset (the ts
    column itself is never projected — extraction results are engine-
    comparable, raw timestamp objects are not)."""
    preds = " AND ".join(_event_predicate(rng) for _ in range(rng.randrange(1, 3)))
    if rng.random() < 0.5:
        return f"""
        SELECT event_id, user_id, year(ts) AS y, month(ts) AS m, day(ts) AS d
        FROM events WHERE {preds}
        """
    return f"""
    SELECT event_type, month(ts) AS m, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
           MIN(event_id) AS min_id
    FROM events WHERE {preds} GROUP BY event_type, m
    """


def _doc_sql(rng: random.Random) -> str:
    """String fuzz over documents: length/case/md5/LIKE in the shared
    subset; text itself projects only through deterministic functions."""
    pred = rng.choice(
        [
            f"length(text) > {rng.choice([50, 200, 500])}",
            f"lang = '{rng.choice(['en', 'es', 'fr', 'de'])}'",
            f"source IN ('src{rng.randrange(20)}', 'src{rng.randrange(20)}')",
            f"text LIKE '%{rng.choice(['the', 'and', 'data', 'ipsum'])}%'",
            f"doc_id % {rng.choice([3, 7])} = 0",
            f"n_chars BETWEEN {rng.choice([0, 100])} AND {rng.choice([400, 2000])}",
        ]
    )
    if rng.random() < 0.5:
        return f"""
        SELECT doc_id, length(text) AS n_len, substring(md5(text), 1, 8) AS h,
               upper(lang) AS lang_u
        FROM documents WHERE {pred}
        """
    return f"""
    SELECT lang, source, COUNT(*) AS n, MIN(length(text)) AS min_len,
           MAX(doc_id) AS max_id
    FROM documents WHERE {pred} GROUP BY lang, source
    """


def _subq_sql(rng: random.Random) -> str:
    """Subquery fuzz: HAVING over aggregates, EXISTS / NOT EXISTS / IN
    correlated and uncorrelated forms — the decorrelation paths Catalyst
    and DuckDB must agree on."""
    kind = rng.choice(["having", "exists", "not_exists", "in_agg"])
    pred = _predicate(rng)
    if kind == "having":
        op = rng.choice([">", "<", ">="])
        thresh = rng.choice([3, 10, 40])
        return f"""
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE {pred}
        GROUP BY o_orderstatus HAVING COUNT(*) {op} {thresh}
        """
    if kind in ("exists", "not_exists"):
        neg = "NOT " if kind == "not_exists" else ""
        return f"""
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE {neg}EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND ({pred})
        )
        """
    return f"""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > {rng.choice([0, 1000, 5000])}
    ) AND ({pred})
    """


def _rollup_sql(rng: random.Random) -> str:
    """Multi-level aggregation and RANGE-frame fuzz: ROLLUP/CUBE nulls
    semantics and numeric range windows must agree across engines.

    KNOWN DIVERGENCE (sidestepped, not hidden): on EMPTY input DuckDB
    emits the ()-grouping-set grand-total row (n=0, SQL-standard
    global-aggregate behavior) while Spark's Expand produces no rows at
    all. The fuzz predicate is OR-guarded to keep some rows so the
    cases exercise the nulls semantics, not that edge."""
    if rng.random() < 0.5:
        op = rng.choice(["ROLLUP", "CUBE"])
        pred = _predicate(rng)
        return f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders WHERE ({pred}) OR o_orderkey % 97 = 0
        GROUP BY {op} (o_orderstatus, o_orderpriority)
        """
    span = rng.choice([10, 500, 5000])
    pred = _predicate(rng)
    return f"""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderkey
               RANGE BETWEEN {span} PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running
    FROM orders WHERE {pred}
    """


_RNG = random.Random(SEED)
FILTER_CASES = [(f"filter_{i}", _filter_sql(_RNG)) for i in range(N_FILTERS)]
AGG_CASES = [(f"agg_{i}", _agg_sql(_RNG)) for i in range(N_AGGS)]
JOIN_CASES = [(f"join_{i}", _join_sql(_RNG)) for i in range(N_JOINS)]
WINDOW_CASES = [(f"window_{i}", _window_sql(_RNG)) for i in range(N_WINDOWS)]
SETOP_CASES = [(f"setop_{i}", _setop_sql(_RNG)) for i in range(N_SETOPS)]
SCALAR_CASES = [(f"scalar_{i}", _scalar_sql(_RNG)) for i in range(N_SCALARS)]
EVENT_CASES = [(f"event_{i}", _event_sql(_RNG)) for i in range(N_EVENTS)]
DOC_CASES = [(f"doc_{i}", _doc_sql(_RNG)) for i in range(N_DOCS)]
SUBQ_CASES = [(f"subq_{i}", _subq_sql(_RNG)) for i in range(N_SUBQ)]
ROLLUP_CASES = [(f"rollup_{i}", _rollup_sql(_RNG)) for i in range(N_ROLLUP)]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def orders_view(spark, sf_dir):
    for name in ("orders", "customer", "events", "documents"):
        load_parquet(spark, f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    yield
    for name in ("orders", "customer", "events", "documents"):
        spark.catalog.dropTempView(name)


@pytest.mark.parametrize(
    "name,sql",
    FILTER_CASES + AGG_CASES + JOIN_CASES + WINDOW_CASES + SETOP_CASES + SCALAR_CASES
    + EVENT_CASES + DOC_CASES + SUBQ_CASES + ROLLUP_CASES,
    ids=lambda c: c if isinstance(c, str) and not c.startswith("\n") else "",
)
def test_fuzz_query_matches_duckdb(spark, duck, orders_view, name, sql):
    assert_matches(spark.sql(sql), duck, sql, name=name)


# ---------------------------------------------------------------------------
# HOF / array-expression family (r06): the array lambdas that power the
# dedup/quality operators, fuzzed cross-engine. Spark and DuckDB spell
# every list function differently (transform/list_transform,
# size/len, sequence/generate_series, aggregate/list_reduce), so this
# family renders each seeded case into BOTH dialects from one template.
# Two dialect traps are baked into the generator on purpose:
# - Spark `sequence(1, 0)` yields a DESCENDING [1, 0] (default step -1)
#   while DuckDB generate_series(1, 0) is empty — every generated
#   sequence upper bound is wrapped in greatest(..., 1);
# - integer-only folds (fold order is immaterial for BIGINT sums;
#   doubles would hash differently between fold orders).
# ---------------------------------------------------------------------------

N_HOF = 10


def _hof_case(rng: random.Random) -> tuple[str, str]:
    key = rng.choice(["o_orderkey", "o_custkey"])
    k = rng.choice([7, 13, 20, 31])
    seq_hi = f"greatest({key} % {k}, 1)"
    body = rng.choice(["x * 2 + 1", "x % 3", "x * x", f"x + {key} % 5"])
    pred = rng.choice(["x % 2 = 0", "x > 3", "x % 3 != 1"])
    pick = rng.sample(["size", "sum", "max", "distinct_n"], k=2)

    def render(dialect: str) -> str:
        if dialect == "spark":
            seq = f"sequence(1, {seq_hi})"
            tr = f"transform({seq}, x -> {body})"
            fil = f"filter({tr}, x -> {pred})"
            outs = {
                "size": f"size({fil})",
                "sum": f"aggregate({fil}, 0L, (a, x) -> a + x)",
                "max": f"array_max({fil})",
                "distinct_n": f"size(array_distinct({fil}))",
            }
        else:
            seq = f"generate_series(1, {seq_hi})"
            tr = f"list_transform({seq}, x -> {body})"
            fil = f"list_filter({tr}, x -> {pred})"
            outs = {
                "size": f"len({fil})",
                "sum": f"list_reduce(list_prepend(0, {fil}), (a, b) -> a + b)",
                "max": f"list_max({fil})",
                "distinct_n": f"len(list_distinct({fil}))",
            }
        cols = ",\n               ".join(
            f"CAST({outs[p]} AS BIGINT) AS out_{p}" for p in sorted(pick)
        )
        return f"""
        SELECT {key} AS row_key,
               {cols}
        FROM orders
        WHERE {key} % 11 = 3
        """

    return render("spark"), render("duck")


HOF_CASES = [(f"hof_{i}",) + _hof_case(_RNG) for i in range(N_HOF)]


@pytest.mark.parametrize(
    "name,spark_sql,duck_sql",
    HOF_CASES,
    ids=[c[0] for c in HOF_CASES],
)
def test_fuzz_hof_matches_duckdb(spark, duck, orders_view, name, spark_sql, duck_sql):
    assert_matches(spark.sql(spark_sql), duck, duck_sql, name=name)


def test_fuzz_words_col_matches_duckdb(spark):
    """The lowercase-alnum tokenization base (text.words_col) is the
    shared regex five oracles replay with DuckDB's
    `list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), ...)`
    — fuzz the parity over adversarial ASCII (empty, boundary
    separators, digit runs, long separator runs, case). Non-ASCII is
    deliberately out of scope: Java and DuckDB lower()/char classes
    can diverge there and every oracle-facing fixture is ASCII."""
    import random
    import string

    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    from pyspark_unload_to_gcs_spark.operators.text import words_col

    rng = random.Random(SEED)
    alphabet = string.ascii_letters + string.digits + " .,;:!?-_/()[]'\"\t\n@#$%^&*+="
    texts = ["", " ", "...", "a", "A1b2", "  leading", "trailing  ", "-a-b-"]
    for _ in range(120):
        n = rng.randint(0, 40)
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})

    sdf = spark.createDataFrame(pdf)
    got = {
        r["i"]: r["w"]
        for r in sdf.select("i", words_col(F.col("text")).alias("w")).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        i: w
        for i, w in con.sql(
            "SELECT i, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
            " x -> x != '') AS w FROM t"
        ).fetchall()
    }
    con.close()
    assert got == want
