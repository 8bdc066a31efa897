"""Device mesh + sharding helpers.

The reference's distributed layer is NCCL-DDP via HF Accelerate
(reference train.py:492-496,691,694; run.sh:1). TPU-native equivalent:
a ``jax.sharding.Mesh`` with a ``data`` axis (DP grad psum rides ICI —
XLA inserts the collective when replicated params meet sharded batches
under jit) and an optional ``model`` axis for tensor-sharding the UNet.

Axes:
  data:  batch dimension — train batches, CFG pairs, PNS seed fan-out
  model: reserved for TP of attention/FFN weights (optional, size 1 by
         default; the reference has no TP at all — SURVEY.md §2)
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def fit_data_mesh(batch_size: int, n_model: int = 1, devices=None) -> Mesh:
    """Largest data axis that divides batch_size (a 2-sample debug batch on
    an 8-device host should shard 2-way, not crash)."""
    devices = devices if devices is not None else jax.devices()
    avail = len(devices) // n_model
    n_data = 1
    for d in range(1, avail + 1):
        if batch_size % d == 0:
            n_data = d
    return make_mesh(n_data=n_data, n_model=n_model, devices=devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with axis-0 sharded over ``data``."""

    def put(x):
        return jax.device_put(x, data_sharded(mesh, np.ndim(x)))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


@contextmanager
def use(mesh: Mesh):
    with mesh:
        yield mesh
