"""Observability (M1): StreamingQueryListener -> in-process metrics.

The reference exposes a Prometheus ``/metrics`` endpoint with a
single stub gauge (``internal/prometheus/prometheus.go:8-16``) plus
statsviz. Here: a listener that aggregates per-query progress into
counters/gauges; `render_prometheus` emits the text exposition
format so any HTTP shim can serve it — no extra deps.
"""

from __future__ import annotations

import threading
from collections import defaultdict

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects rows/sec + batch counts per streaming query."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.batches = defaultdict(int)
        self.rows = defaultdict(int)
        self.last_rate = defaultdict(float)
        self.active = {}

    def onQueryStarted(self, event) -> None:
        # Keyed by query id in BOTH start and terminate handlers —
        # a name-keyed entry would never be cleared on termination
        # (terminate events carry only the id).
        with self._lock:
            self.active[str(event.id)] = True

    def onQueryProgress(self, event) -> None:
        p = event.progress
        name = p.name or str(p.id)
        with self._lock:
            self.batches[name] += 1
            self.rows[name] += p.numInputRows or 0
            self.last_rate[name] = p.processedRowsPerSecond or 0.0

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.active[str(event.id)] = False

    def onQueryIdle(self, event) -> None:  # Spark 3.4+
        pass

    @staticmethod
    def _esc(label: str) -> str:
        """Prometheus label-value escaping (backslash, quote,
        newline — exposition-format requirement): query names come
        from caller-supplied task ids, and an unescaped quote would
        corrupt the whole scrape."""
        return (label.replace("\\", "\\\\").replace('"', '\\"')
                .replace("\n", "\\n"))

    def render_prometheus(self) -> str:
        """Prometheus text exposition format."""
        lines = [
            "# TYPE galaxy_stream_batches_total counter",
            "# TYPE galaxy_stream_rows_total counter",
            "# TYPE galaxy_stream_rows_per_second gauge",
        ]
        esc = self._esc
        with self._lock:
            for name, n in self.batches.items():
                lines.append(
                    f'galaxy_stream_batches_total{{query="{esc(name)}"}} {n}')
            for name, n in self.rows.items():
                lines.append(
                    f'galaxy_stream_rows_total{{query="{esc(name)}"}} {n}')
            for name, r in self.last_rate.items():
                lines.append(
                    f'galaxy_stream_rows_per_second{{query="{esc(name)}"}} {r}')
        return "\n".join(lines) + "\n"
