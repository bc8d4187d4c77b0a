"""Device/system statistics.

Capability parity with ``daan/data/sysstats.py`` (NvidiaStats): the
accelerator memory queries become jax device memory_stats; host RAM/CPU come
from /proc (no psutil dependency).
"""
import os


class DeviceStats:
    """Accelerator memory/utilization via jax device APIs."""

    @staticmethod
    def memory_usage():
        """Per-device {device: {bytes_in_use, bytes_limit}} where available."""
        import jax

        acc = {}
        for device in jax.local_devices():
            stats = {}
            try:
                stats = device.memory_stats() or {}
            except Exception:
                pass
            acc[str(device)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        return acc

    @staticmethod
    def memory_usage_by_pid(pid=None):
        """Single-process runtime: this process owns the devices."""
        pid = pid if pid is not None else os.getpid()
        usage = DeviceStats.memory_usage()
        total = sum(v["bytes_in_use"] or 0 for v in usage.values())
        return {pid: total}


class HostStats:
    @staticmethod
    def memory_gb():
        """(used, total) host RAM in GB from /proc/meminfo."""
        info = {}
        with open("/proc/meminfo") as handle:
            for line in handle:
                key, _, rest = line.partition(":")
                info[key] = int(rest.strip().split()[0])  # kB
        total = info.get("MemTotal", 0) / 1e6
        available = info.get("MemAvailable", 0) / 1e6
        return round(total - available, 2), round(total, 2)

    @staticmethod
    def loadavg():
        with open("/proc/loadavg") as handle:
            return tuple(float(x) for x in handle.read().split()[:3])
