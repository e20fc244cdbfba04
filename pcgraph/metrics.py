"""Stage-metrics sampling for the CPU-vs-I/O breakdown of a superstep.

The north-rule scaling gate needs evidence of WHAT does not scale when
parallelism changes (BENCH/BASELINE.md round-2 plan): this samples the
Spark UI REST API (public monitoring surface, /api/v1) and reports, per
sampled window, executor CPU time vs run time, GC time, shuffle bytes
and spill bytes summed over completed stages.  Works in local mode and
on a cluster driver alike; requires ``spark.ui.enabled=true``.
"""

from __future__ import annotations

import json
from urllib.request import urlopen

# stage fields summed per snapshot; times in ms except executorCpuTime
# (ns, normalized below), bytes as bytes
_FIELDS = (
    "executorRunTime",
    "executorCpuTime",
    "executorDeserializeTime",
    "jvmGcTime",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "inputBytes",
    "outputBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
)


class StageMetricsSampler:
    """Cumulative stage-metric snapshots; ``delta()`` = one window."""

    def __init__(self, spark):
        sc = spark.sparkContext
        self.url = sc.uiWebUrl  # None when spark.ui.enabled=false
        self.app_id = sc.applicationId
        self._last = self.snapshot()

    @property
    def available(self) -> bool:
        return self.url is not None

    def snapshot(self) -> dict[str, float]:
        totals = dict.fromkeys(_FIELDS, 0.0)
        if not self.available:
            return totals
        try:
            with urlopen(
                f"{self.url}/api/v1/applications/{self.app_id}/stages?status=complete",
                timeout=10,
            ) as fh:
                stages = json.load(fh)
        except Exception:
            return totals
        for st in stages:
            for f in _FIELDS:
                v = st.get(f)
                if v is not None:
                    totals[f] += v
        totals["executorCpuTime"] /= 1e6  # ns -> ms, align with RunTime
        return totals

    def delta(self) -> dict[str, float]:
        """Metrics accumulated since the previous ``delta()`` call."""
        now = self.snapshot()
        out = {f: round(now[f] - self._last[f], 1) for f in _FIELDS}
        self._last = now
        return out


class HostCpuSampler:
    """Per-window host CPU accounting from ``/proc/stat`` — documents
    measurement-window quality on a multi-tenant host (CPU steal means
    the hypervisor gave our vCPUs away; high `sys`/iowait means ambient
    contention).  Scaling-efficiency pairs are only comparable when both
    runs saw similar steal, so each bench round records this."""

    _KEYS = ("user", "nice", "sys", "idle", "iowait", "irq", "softirq", "steal")

    def __init__(self):
        self._last = self._read()

    @staticmethod
    def _read() -> list[int] | None:
        try:
            with open("/proc/stat") as fh:
                first = fh.readline().split()
            return [int(x) for x in first[1:9]]
        except Exception:
            return None

    def delta(self) -> dict[str, float]:
        """Fraction of total host CPU ticks per category since the last
        call (e.g. ``steal_pct``)."""
        now = self._read()
        if now is None or self._last is None:
            return {}
        d = [n - l for n, l in zip(now, self._last)]
        self._last = now
        total = sum(d) or 1
        return {
            f"{k}_pct": round(100.0 * v / total, 2)
            for k, v in zip(self._KEYS, d)
        }
