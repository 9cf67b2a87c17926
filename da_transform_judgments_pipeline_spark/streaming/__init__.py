"""Structured Streaming front end (SURVEY.md §2.7 T1-T10): the reference's
SQS → trigger → Step Functions orchestration re-expressed as a streaming
event pipeline with foreachBatch dispatch, idempotency dedup, retry routing
with a dead-letter table, and keyed retry state."""

from . import orchestrator, retry_state, sessions  # noqa: F401
