"""Plan lint: every registered query's physical plan is screened for
anti-patterns that break at 100 TB.

- ``BatchEvalPython`` = row-at-a-time Python UDF in the plan — always a
  bug in this engine (Arrow-batched ``ArrowEvalPython`` / ``MapInPandas``
  / ``FlatMapGroupsInPandas*`` are the sanctioned Python paths).
- ``CartesianProduct`` = unkeyed shuffle-product — never acceptable;
  intentional small-dim expansions must come through broadcast
  (BroadcastNestedLoopJoin), which caps the replicated side.
"""

import pytest

from pyspark_unload_to_gcs_spark import registry

QUERY_NAMES = sorted(registry.queries().keys())


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_row_python_udf_and_no_cartesian(spark, sf_dir, name):
    plan = _plan(registry.queries()[name](spark, sf_dir))
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
