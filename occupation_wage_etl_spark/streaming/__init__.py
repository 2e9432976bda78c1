"""Structured Streaming operators (see ``events``).

The reference is batch-only (SURVEY.md §1.1) — this module exists for
the engine's own completeness: the ``events`` table models a stream, and
large-scale pipelines ingest continuously.
"""

from occupation_wage_etl_spark.streaming import events

__all__ = ["events"]
