"""Streaming observability: per-batch throughput/latency capture.

A pipeline nobody can see is a pipeline nobody can size. Spark's
``StreamingQueryListener`` already emits per-batch progress
(input rows, processing rate, per-stage duration breakdown) — this
module captures it into plain rows so throughput regressions are
testable the same way plan shapes are.

At scale the same listener feeds a metrics sink (statsd/prometheus
bridge); here it accumulates in-process, which is exactly what the
tests need and adds zero overhead to the stream itself (the listener
runs on the driver's event bus, off the hot path).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_id: str
    batch_id: int
    num_input_rows: int
    process_rate: float
    batch_duration_ms: int


@dataclass
class MetricsCollector(StreamingQueryListener):
    """Accumulates one :class:`BatchMetric` per completed micro-batch.

    Attach with ``spark.streams.addListener(collector)``; detach with
    ``spark.streams.removeListener(collector)`` (always detach in a
    ``finally`` — listeners outlive the query).
    """

    metrics: list[BatchMetric] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.metrics.append(
            BatchMetric(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                process_rate=p.processedRowsPerSecond or 0.0,
                batch_duration_ms=p.batchDuration,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def total_rows(self) -> int:
        return sum(m.num_input_rows for m in self.metrics)
