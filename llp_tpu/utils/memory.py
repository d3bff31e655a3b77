"""Device memory statistics — the TPU-native replacement for the reference's
dead ``get_gpu_memory_map`` nvidia-smi probe (reference ``src/utils.py:11-28``).
"""

from __future__ import annotations

from typing import Dict


def get_device_memory_map() -> Dict[int, Dict[str, int]]:
    """Per-device memory stats (bytes) from the PJRT runtime.

    Keys follow jax's ``Device.memory_stats()``: ``bytes_in_use``,
    ``peak_bytes_in_use``, ``bytes_limit`` where the backend reports them
    (CPU devices typically return {}).
    """
    import jax

    out: Dict[int, Dict[str, int]] = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out[d.id] = {
            k: int(v)
            for k, v in stats.items()
            if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
        }
    return out
