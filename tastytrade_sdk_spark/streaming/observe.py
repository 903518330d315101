"""Pipeline observability (SURVEY A7 / ST10).

The reference tracks per-queue counters (total_messages, error_count,
max_queue_size — handlers.py:24-38) and runs a health log loop. The
Spark-native equivalents:

- batch: ``df.observe`` named metrics evaluated inline with the job
  (no extra pass over the data);
- streaming: a StreamingQueryListener capturing per-micro-batch
  progress (rows/sec, batch duration, state size).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_counts(
    df: DataFrame,
    error_predicate=None,
    value_col: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach queue-metrics-style named observations: total rows,
    error rows, null values. Read ``observation.get`` after an action."""
    obs = Observation("pipeline_metrics")
    metrics = [F.count(F.lit(1)).alias("total_messages")]
    if error_predicate is not None:
        metrics.append(
            F.sum(F.when(error_predicate, 1).otherwise(0)).alias("error_count")
        )
    if value_col is not None:
        metrics.append(
            F.sum(F.when(F.col(value_col).isNull(), 1).otherwise(0)).alias(
                "null_values"
            )
        )
    return df.observe(obs, *metrics), obs


@dataclass
class ProgressCapture:
    """StreamingQueryListener recording per-batch throughput (the
    queue-depth / backpressure signal of ST10)."""

    batches: list[dict] = field(default_factory=list)

    def make_listener(self):
        from pyspark.sql.streaming import StreamingQueryListener

        capture = self.batches

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                capture.append(
                    {
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "processed_rows_per_sec": p.processedRowsPerSecond,
                        "duration_ms": p.durationMs.get("triggerExecution"),
                    }
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        return _L()
