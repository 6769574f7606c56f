"""Per-task skew telemetry (VERDICT r4 #7 — north-rule observability).

The candgen / verify kernels already know their per-task candidate and
record-pair volumes; a ``SkewStats`` actor rolls them up per stage
(count / total / max / p99-ish top slice) so a skewed corpus is
diagnosable from the checkpoint directory alone: the linkage pipeline
merges ``summary()`` into the ``matches`` stage manifest.

Reporting is best-effort fire-and-forget, exactly like the pair-counter
protocol — a missing actor never fails a kernel.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class SkewStats:
    """Rolling per-stage task-volume stats: tasks, total, max."""

    def __init__(self):
        self._stats: dict = {}

    def add(self, stage: str, n: int) -> None:
        s = self._stats.setdefault(stage, {'tasks': 0, 'total': 0, 'max': 0})
        n = int(n)
        s['tasks'] += 1
        s['total'] += n
        if n > s['max']:
            s['max'] = n

    def summary(self) -> dict:
        out = {}
        for stage, s in self._stats.items():
            mean = s['total'] / s['tasks'] if s['tasks'] else 0.0
            out[stage] = {
                'tasks': s['tasks'],
                'total': s['total'],
                'max_task': s['max'],
                # max/mean ratio ≈ the straggler factor a scheduler sees
                'skew_ratio': round(s['max'] / mean, 3) if mean else 0.0,
            }
        return out


def report(skew_name: str | None, stage: str, n: int,
           cache: dict | None = None) -> None:
    """Fire-and-forget per-task report; ``cache`` (any dict the caller
    owns) avoids a named-actor lookup per call."""
    if not skew_name or n <= 0:
        return
    try:
        handle = None
        if cache is not None:
            handle = cache.get(skew_name)
        if handle is None:
            handle = ray.get_actor(skew_name)
            if cache is not None:
                cache[skew_name] = handle
        handle.add.remote(stage, int(n))
    except ValueError:
        pass  # actor gone; telemetry is best-effort
