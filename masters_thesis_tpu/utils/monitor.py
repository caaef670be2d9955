"""Device monitoring & allocation gating.

Reference equivalents: nv_monitor.py:7-141 (busy-wait until a GPU has free
memory, parsing nvidia-smi) and CNN_RNN/check_mem.py:6-46. On TPU the same
role is served by PJRT memory stats — no subprocess parsing.
"""

from __future__ import annotations

import time


def device_memory_stats(device=None) -> dict:
    """bytes_in_use / bytes_limit etc. for one device (empty if unsupported)."""
    import jax

    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def memory_fraction_used(device=None) -> float:
    s = device_memory_stats(device)
    limit = s.get("bytes_limit") or s.get("bytes_reservable_limit")
    used = s.get("bytes_in_use")
    if not limit or used is None:
        return 0.0
    return used / limit


def wait_for_device(
    max_fraction: float = 0.5, wait_s: float = 10.0, timeout_s: float = 3600.0,
    device=None,
) -> bool:
    """Busy-wait until device memory use drops below ``max_fraction``
    (nv_monitor.monitor semantics). Returns False on timeout."""
    start = time.time()
    while time.time() - start < timeout_s:
        if memory_fraction_used(device) <= max_fraction:
            return True
        time.sleep(wait_s)
    return False
