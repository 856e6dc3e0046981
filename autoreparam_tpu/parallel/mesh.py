"""Device mesh + chain sharding — the distributed backend (L0).

The reference has NO distributed anything (TF1, one device;
SURVEY.md §3.3/§3.4).  Scale in this problem domain is the *chain*
axis, so the TPU-native design is a 1-D `Mesh(('chains',))`:

- the (C, D) chain batch is sharded over devices on axis 0 (this is the
  data-parallel axis; TP/PP/SP/EP are structurally inapplicable — the
  models are KB-sized with no sequence dimension, SURVEY.md §3.3);
- the samplers are embarrassingly parallel across chains, so sharding
  is expressed with `jax.jit` + `NamedSharding` in/out specs and XLA's
  SPMD partitioner — no manual communication on the sampling path;
- cross-chain reductions (pooled ESS/R-hat moments, pooled acceptance)
  run inside `shard_map` with explicit `psum` over ICI (collectives.py).

Works identically on one real TPU chip (mesh of 1), N real chips, or
the 8-virtual-device CPU mesh used in CI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_chains", "replicate", "CHAIN_AXIS"]

CHAIN_AXIS = "chains"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the chain axis."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def shard_chains(mesh: Mesh, x, axis: int = 0):
    """Place `x` with its chain axis sharded over the mesh."""
    spec = [None] * np.ndim(x)
    spec[axis] = CHAIN_AXIS
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
