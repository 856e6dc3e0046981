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

__all__ = ["make_mesh", "make_mesh_hierarchical", "shard_chains",
           "replicate", "CHAIN_AXIS", "DCN_AXIS"]

CHAIN_AXIS = "chains"
DCN_AXIS = "dcn"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the chain axis."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def make_mesh_hierarchical(num_slices: int,
                           devices: Optional[Sequence] = None) -> Mesh:
    """2-D ('dcn', 'chains') mesh for pod-spanning runs.

    Chains shard over the PRODUCT of both axes (every sharded runner
    and collective here uses the full mesh axis tuple, so the same
    code runs on 1-D and hierarchical meshes).  The hierarchy matters
    only for traffic placement: per-chain sampling needs no
    communication at all, and the pooled-moment psums reduce O(D)
    scalars — XLA reduces within a slice over ICI first, then across
    slices over DCN, so DCN carries only the tiny pooled partials.
    North star is single-chip (BASELINE.json); this is the documented
    + CI-exercised scale-out path beyond it (SURVEY.md §3.4 "DCN only
    if the build ever spans pods")."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if len(devices) % num_slices:
        raise ValueError(f"{len(devices)} devices not divisible into "
                         f"{num_slices} slices")
    return Mesh(devices.reshape(num_slices, -1), (DCN_AXIS, CHAIN_AXIS))


def chain_axes(mesh: Mesh):
    """All mesh axis names, as the chain-dim spec/psum axis tuple."""
    return tuple(mesh.axis_names)


def shard_chains(mesh: Mesh, x, axis: int = 0):
    """Place `x` with its chain axis sharded over the (whole) mesh."""
    spec = [None] * np.ndim(x)
    spec[axis] = chain_axes(mesh)
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
