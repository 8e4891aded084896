"""Streaming self-monitoring — SURVEY.md §2.9 T6 / §2.4 A5.

The reference polls ``query.recentProgress`` in a driver loop and prints
rows/batches/rows-per-second (``spark/SaveDelta.scala:171-203``). Here it's
a proper ``StreamingQueryListener`` capturing the same metrics
structurally, plus a summary equivalent to the reference's printout.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressStats:
    """Running totals (SaveDelta.scala:176-203)."""

    batches: int = 0
    total_rows: int = 0
    input_rows_per_sec: list[float] = field(default_factory=list)
    processed_rows_per_sec: list[float] = field(default_factory=list)

    @property
    def mean_rows_per_batch(self) -> float:
        return self.total_rows / self.batches if self.batches else 0.0

    def summary(self) -> dict:
        return {
            "batches": self.batches,
            "total_rows": self.total_rows,
            "mean_rows_per_batch": self.mean_rows_per_batch,
            "last_input_rows_per_sec": (
                self.input_rows_per_sec[-1] if self.input_rows_per_sec else None
            ),
            "last_processed_rows_per_sec": (
                self.processed_rows_per_sec[-1] if self.processed_rows_per_sec else None
            ),
        }


class MetricsListener(StreamingQueryListener):
    """T6: collects per-batch progress for all queries on the session."""

    def __init__(self) -> None:
        self.stats = ProgressStats()
        self.errors: list[str] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.stats.batches += 1
        self.stats.total_rows += p.numInputRows
        if p.inputRowsPerSecond is not None:
            self.stats.input_rows_per_sec.append(p.inputRowsPerSecond)
        if p.processedRowsPerSecond is not None:
            self.stats.processed_rows_per_sec.append(p.processedRowsPerSecond)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if event.exception is not None:
            self.errors.append(str(event.exception))
