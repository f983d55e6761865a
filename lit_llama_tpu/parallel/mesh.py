"""Device mesh construction for SPMD execution.

The reference delegates distribution to Lightning Fabric strategy objects (FSDP /
DeepSpeed / torch_xla, SURVEY.md §2.8). TPU-native replacement: ONE
``jax.sharding.Mesh`` with named axes and everything else is a ``PartitionSpec``
annotation — XLA SPMD emits the collectives (psum for grad reduce ≙ NCCL
all-reduce, all-gather for FSDP-style parameter sharding) over ICI.

Axes:
  data  — batch / FSDP parameter sharding (maps to DCN across slices)
  model — tensor parallelism over attention heads / MLP hidden
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a {data, model} mesh over the available devices.

    ``data=-1`` uses all devices not taken by the model axis. The model axis is
    laid out innermost so tensor-parallel collectives ride the fastest ICI links.
    """
    if devices is None:
        from lit_llama_tpu.parallel.launch import maybe_initialize_distributed

        maybe_initialize_distributed()
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    if n > 1 and devices == jax.devices():
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh((data, model))
        except Exception:
            arr = np.asarray(devices).reshape(data, model)
    else:
        arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))
