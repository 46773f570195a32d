"""Structured Streaming facade (SURVEY.md §2j mapping).

The reference is pure batch; its "streaming" is an external orchestrator
re-running the job with advancing ``time_cutoff_ms`` watermarks
(reference export.py:131-158, 296-300, 333-337). This package is the
native-Spark replacement for that loop: ``readStream`` file sources,
event-time watermarks instead of the ``--delay_ms`` late-arrival guard,
windowed/stateful operators, and a ``foreachBatch`` sink that reuses the
batch export writers so each micro-batch lands exactly like one
orchestrated incremental export.
"""
