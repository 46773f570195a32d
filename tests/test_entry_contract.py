"""Driver-contract shim (__spark_entry__.py): the exact surface the
driver consumes — entry() smoke, queries()/oracle_sql() shape — guarded
locally so a registry import error can't surface first in the driver."""

import importlib.util
import os


def _load_entry():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows_with_stable_schema(spark):
    e = _load_entry()
    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == e.entry(spark).columns  # stable across invocations
    assert "row_hash" in df.columns


def test_queries_and_oracles_contract(spark):
    e = _load_entry()
    queries = e.queries()
    oracles = e.oracle_sql()
    assert len(queries) >= 95
    assert set(oracles) <= set(queries)  # every oracle has a query
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in oracles.values())
    assert all(callable(fn) for fn in queries.values())
