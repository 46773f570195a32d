"""session_token contract (ADVICE r05 + r06): per-session memo keys
must be stable for a session's lifetime, distinct across
``newSession()`` siblings (which share an applicationId), and never
collide via recycled object addresses."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark.session import session_token


def test_token_stable_within_session(spark):
    assert session_token(spark) == session_token(spark)


def test_token_embeds_application_id(spark):
    assert session_token(spark).startswith(spark.sparkContext.applicationId)


def test_new_session_sibling_gets_distinct_token(spark):
    sibling = spark.newSession()
    try:
        assert session_token(sibling) != session_token(spark)
        # sibling's token is stable too
        assert session_token(sibling) == session_token(sibling)
    finally:
        # newSession siblings share the context; nothing to stop
        pass
