"""Multi-host launch: one process per TPU host, standard JAX model.

Replaces the reference's ``fabric.launch()`` per-device process spawning
(reference: pretrain/redpajama.py:80): on TPU pods each host runs the same
script; ``jax.distributed.initialize`` wires the hosts into one global device
view and XLA drives ICI/DCN collectives from the sharding annotations.
"""

from __future__ import annotations

import os
import sys

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize multi-host JAX when a coordinator is configured.

    Reads ``JAX_COORDINATOR`` (host:port of process 0), ``JAX_NUM_PROCESSES``
    and ``JAX_PROCESS_ID``; on Cloud TPU pods these resolve automatically and
    plain ``jax.distributed.initialize()`` is used. Returns True if the
    distributed runtime was initialized by this call.
    """
    global _initialized
    if _initialized:
        return False
    coordinator = os.environ.get("JAX_COORDINATOR")
    if coordinator is None and os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") in ("", "localhost"):
        return False

    import jax

    kwargs = {}
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
        print(
            f"[launch] process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices",
            file=sys.stderr,
        )
        return True
    except Exception as e:  # single-host runs proceed without the runtime
        print(f"[launch] distributed init skipped: {e}", file=sys.stderr)
        return False
