"""Device memory reporting (reference: generate.py:154-155 prints
``torch.cuda.max_memory_reserved`` after inference; the TPU equivalent is the
PJRT client's allocator stats)."""

from __future__ import annotations

import sys
from typing import Optional


def peak_memory_gb() -> Optional[float]:
    """Peak bytes in use on the first local device, in GiB — None when the
    backend doesn't expose allocator stats (e.g. CPU)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return None
    peak = stats.get("peak_bytes_in_use")
    return None if not peak else peak / 2**30


def print_peak_memory(file=None) -> None:
    peak = peak_memory_gb()
    if peak is not None:
        print(
            f"Peak device memory in use: {peak:.02f} GB",
            file=file or sys.stderr,
        )
