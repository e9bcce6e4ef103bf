"""Small runtime helpers shared across stages and pipelines."""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    """Total cluster CPUs (>=1); ``default`` when Ray is not initialized or
    resources are unavailable. The ONE definition — stages and pipelines
    must not re-implement this probe with divergent fallbacks."""
    try:
        import ray

        return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:  # noqa: BLE001
        return default
