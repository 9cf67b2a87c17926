"""Outbound event sinks: forward (SNS-style), status alerts, DLQ alerts.

Reference parity (SURVEY.md §2.1/§2.7):

- S17 `tre_forward.forward_tre_event_to_sns` (tre_forward.py:40-95):
  republish the event with ``MessageAttributes`` mirrored for subscriber
  filtering (T8). Here :func:`forward_sink` — a ``foreachBatch`` function
  that calls an injected transport per event and accumulates per-record
  failures, raising only after the whole batch is attempted (A6 error
  accumulation, tre_forward.py:108-142).
- S18 Slack status alert (tre_slack_alerts.py:8-48) → :func:`status_alert`
  payload builder + :func:`alert_sink`.
- S19 DLQ alert (tre_dlq_slack_alerts.py:11-37) → :func:`dlq_alert`.

Transports are plain callables (``payload -> None``) so the engine has no
network dependency; production wires an HTTP POST, tests wire a list.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ForwardError(RuntimeError):
    """Raised after a batch when ≥1 event failed to forward; carries the
    per-record failure list (reference: execution_fail_list)."""

    def __init__(self, failures: list[dict]):
        super().__init__(f"{len(failures)} event(s) failed to forward")
        self.failures = failures


def status_alert(
    environment: str, producer: str, event_name: str, reference: str
) -> dict:
    """S18 payload: the reference's status message shape
    (tre_slack_alerts.py:8-48) — one compact text block per event."""
    return {
        "text": (
            f":information_source: *{environment}* `{producer}` "
            f"emitted `{event_name}` for consignment `{reference}`"
        )
    }


def dlq_alert(environment: str, queue: str, reference: str, error: str) -> dict:
    """S19 payload: dead-letter alert (tre_dlq_slack_alerts.py:11-37)."""
    return {
        "text": (
            f":rotating_light: *{environment}* DLQ `{queue}`: consignment "
            f"`{reference}` dead-lettered — {error}"
        )
    }


def alert_sink(
    transport: Callable[[dict], None],
    environment: str,
    kind: str = "status",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch factory for S18/S19. Expects the routed event frame
    (columns: producer struct / event_name / reference, plus ``error`` for
    the DLQ stream). Rows are collected per batch — alert streams are the
    error tail, orders of magnitude smaller than the data path."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        for row in batch.collect():
            if kind == "dlq":
                payload = dlq_alert(
                    environment,
                    row["queue"] if "queue" in row else "tre-in",
                    row["reference"],
                    row["error"] if "error" in row else "",
                )
            else:
                payload = status_alert(
                    environment,
                    row["producer_name"] if "producer_name" in row else "tre",
                    row["event_name"],
                    row["reference"],
                )
            transport(payload)

    return sink


def forward_sink(
    transport: Callable[[str, dict], None],
    attribute_cols: tuple[str, ...] = ("environment", "producer", "type"),
) -> Callable[[DataFrame, int], None]:
    """S17/T8/A6 foreachBatch factory: re-publish each event's JSON with its
    message attributes. Every record is attempted; failures accumulate and
    one :class:`ForwardError` is raised after the batch (so the stream's
    retry policy sees the whole failure list, not just the first)."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        cols = [c for c in attribute_cols if c in batch.columns]
        rows = batch.select(
            F.col("event_json"), *[F.col(c) for c in cols]
        ).collect()
        failures: list[dict] = []
        for row in rows:
            attrs = {c: row[c] for c in cols}
            try:
                transport(row["event_json"], attrs)
            except Exception as e:  # accumulate — A6 semantics
                failures.append(
                    {"attributes": attrs, "error": f"{type(e).__name__}: {e}"}
                )
        if failures:
            raise ForwardError(failures)

    return sink
