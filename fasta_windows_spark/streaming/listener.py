"""StreamingQueryListener capturing per-batch progress (lineage + metrics
evidence, north_rule): rows/sec, state-store metrics, watermark advance.
Replaces the reference's two-pass progress bar (fw.rs:46-53) — metrics are
free in Structured Streaming."""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    def __init__(self):
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event):
        self.started.append(str(event.id))

    def onQueryProgress(self, event):
        try:
            self.progress.append(json.loads(event.progress.json))
        except Exception:
            pass

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.terminated.append(str(event.id))

    # convenience -------------------------------------------------------------
    def total_input_rows(self) -> int:
        return int(sum(p.get("numInputRows", 0) for p in self.progress))

    def rows_dropped_by_watermark(self) -> int:
        """Late rows the watermark REJECTED, summed over the run — the
        pipeline's data-loss ledger. A recrawl job reads this to decide
        whether its watermark horizon is too tight for the crawl's actual
        out-of-orderness (FIXTURES.md plants ~2% beyond-horizon rows for
        exactly this purpose)."""
        return int(
            sum(
                s.get("numRowsDroppedByWatermark", 0)
                for p in self.progress
                for s in p.get("stateOperators", [])
            )
        )

    def summary(self) -> dict:
        per_batch = [
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "inputRowsPerSecond": p.get("inputRowsPerSecond"),
                "processedRowsPerSecond": p.get("processedRowsPerSecond"),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
                "stateRows": sum(
                    s.get("numRowsTotal", 0) for s in p.get("stateOperators", [])
                ),
                "droppedByWatermark": sum(
                    s.get("numRowsDroppedByWatermark", 0)
                    for s in p.get("stateOperators", [])
                ),
                "durationMs": p.get("durationMs"),
                "stateCommitMs": sum(
                    s.get("commitTimeMs", 0) for s in p.get("stateOperators", [])
                ),
            }
            for p in self.progress
        ]
        return {
            "batches": per_batch,
            "total_input_rows": self.total_input_rows(),
            "rows_dropped_by_watermark": self.rows_dropped_by_watermark(),
        }
