"""Device/host memory telemetry — llama_mem_telemetry counterpart
(src/llama-mem-telemetry.h:31-92): cached free/total polling with pressure
(0.85) / critical (0.95) predicates and a refresh interval. TPU-native: per
device we read jax's allocator stats; host RAM comes from /proc/meminfo."""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class MemStats:
    device_used: int = 0
    device_limit: int = 0
    host_used: int = 0
    host_total: int = 0

    @property
    def device_frac(self) -> float:
        return self.device_used / self.device_limit if self.device_limit else 0.0

    @property
    def host_frac(self) -> float:
        return self.host_used / self.host_total if self.host_total else 0.0


@dataclass
class MemTelemetry:
    pressure_threshold: float = 0.85
    critical_threshold: float = 0.95
    refresh_s: float = 0.1
    _stats: MemStats = field(default_factory=MemStats)
    _t_last: float = 0.0

    def refresh(self, force: bool = False) -> MemStats:
        now = time.monotonic()
        if not force and now - self._t_last < self.refresh_s:
            return self._stats
        self._t_last = now
        s = MemStats()
        try:
            import jax

            for d in jax.local_devices():
                ms = d.memory_stats() or {}
                s.device_used += int(ms.get("bytes_in_use", 0))
                s.device_limit += int(ms.get("bytes_limit",
                                             ms.get("bytes_reservable_limit", 0)))
        except Exception:  # noqa: BLE001 — platform without memory_stats
            pass
        try:
            info = {}
            with open("/proc/meminfo") as f:
                for line in f:
                    k, v = line.split(":", 1)
                    info[k] = int(v.strip().split()[0]) * 1024
            s.host_total = info.get("MemTotal", 0)
            s.host_used = s.host_total - info.get("MemAvailable", 0)
        except OSError:
            pass
        self._stats = s
        return s

    # predicates (llama_mem_telemetry::is_under_pressure / is_critical)
    def under_pressure(self) -> bool:
        return self.refresh().device_frac >= self.pressure_threshold

    def critical(self) -> bool:
        return self.refresh().device_frac >= self.critical_threshold

    def snapshot(self) -> dict:
        s = self.refresh()
        return {
            "device_used_bytes": s.device_used,
            "device_limit_bytes": s.device_limit,
            "device_frac": round(s.device_frac, 4),
            "host_used_bytes": s.host_used,
            "host_total_bytes": s.host_total,
            "host_frac": round(s.host_frac, 4),
            "pressure": s.device_frac >= self.pressure_threshold,
            "critical": s.device_frac >= self.critical_threshold,
        }
