"""Sharded sampler runners: HMC/NUTS over the chain mesh.

The samplers are pure vmapped programs, so sharding is declarative:
jit with NamedSharding on the chain axis and XLA's SPMD partitioner
splits every per-chain computation across devices; the only cross-
device traffic is the psum'd diagnostics (collectives.py) and the
final gather if the caller materialises samples on host.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference import hmc as H
from ..inference import nuts as N
from .mesh import chain_axes, shard_chains

__all__ = ["run_hmc_sharded", "run_nuts_sharded", "run_chees_sharded",
           "run_ghmc_sharded", "run_interleaved_sharded"]


def _chain_sharding(mesh, axis):
    # the chain dim shards over ALL mesh axes: identical code on a 1-D
    # ('chains',) mesh and a hierarchical ('dcn', 'chains') mesh
    spec = [None] * (axis + 1)
    spec[axis] = chain_axes(mesh)
    return NamedSharding(mesh, P(*spec))


def run_hmc_sharded(potential_fn: Callable, init_positions, key,
                    config: H.HMCConfig, mesh: Mesh,
                    inv_mass_diag=None,
                    collect_fn: Optional[Callable] = None,
                    dense_mask=None):
    """run_hmc with the chain batch sharded over `mesh`.

    `init_positions` (C, D) is placed with chains sharded; all scan
    state inherits the sharding through XLA propagation.  Samples come
    back sharded (S, C, D) on axis 1 — feed them to
    parallel.collectives for pooled diagnostics without a gather.

    `mass_structure="dense"` works unchanged under sharding: the dense
    ensemble Welford's chain-axis reductions (`jnp.mean(z, 0)`,
    `zcᵀ·zc`) lower to psums over ICI, and the (D, D) metric state
    (Σ, R, Cholesky at window ends) stays replicated on every device —
    O(D²) replicated FLOPs per window, negligible next to the sharded
    leapfrog gradients.
    """
    init = shard_chains(mesh, init_positions, axis=0)

    fn = jax.jit(
        lambda i, k: H.run_hmc(potential_fn, i, k, config,
                               inv_mass_diag=inv_mass_diag,
                               collect_fn=collect_fn,
                               dense_mask=dense_mask),
        in_shardings=(_chain_sharding(mesh, 0), NamedSharding(mesh, P())),
    )
    return fn(init, key)


def run_nuts_sharded(potential_fn: Callable, init_positions, key,
                     mesh: Mesh, **kwargs):
    """run_nuts with the chain batch sharded over `mesh`
    (BASELINE config #5: election88, 8192 chains)."""
    init = shard_chains(mesh, init_positions, axis=0)
    fn = jax.jit(
        lambda i, k: N.run_nuts(potential_fn, i, k, **kwargs),
        in_shardings=(_chain_sharding(mesh, 0), NamedSharding(mesh, P())),
    )
    return fn(init, key)


def run_interleaved_sharded(model: Callable, init_positions, key,
                            config: H.HMCConfig, mesh: Mesh,
                            model_args: tuple = (),
                            model_kwargs=None,
                            collect_fn: Optional[Callable] = None):
    """run_interleaved_hmc over the chain mesh.

    The iHMC outer step (two vmapped HMC kernels + the trace-replay
    coordinate maps, all per-chain) is embarrassingly chain-parallel, so
    the same declarative jit sharding used for HMC/NUTS applies; the
    coordinate maps introduce no cross-chain traffic.
    """
    from ..inference.interleaved import run_interleaved_hmc

    init = shard_chains(mesh, init_positions, axis=0)
    fn = jax.jit(
        lambda i, k: run_interleaved_hmc(
            model, i, k, config, model_args=model_args,
            model_kwargs=model_kwargs, collect_fn=collect_fn),
        in_shardings=(_chain_sharding(mesh, 0), NamedSharding(mesh, P())),
    )
    return fn(init, key)


def run_chees_sharded(potential_fn: Callable, init_positions, key,
                      mesh: Mesh, config=None, **kwargs):
    """run_chees over the chain mesh.  The ChEES cross-chain moments
    (z̄, ensemble variance) are plain jnp.means over the sharded chain
    axis — XLA lowers them to psums over ICI."""
    from ..inference import chees as CH

    config = config or CH.CheesConfig()
    init = shard_chains(mesh, init_positions, axis=0)
    fn = jax.jit(
        lambda i, k: CH.run_chees(potential_fn, i, k, config, **kwargs),
        in_shardings=(_chain_sharding(mesh, 0), NamedSharding(mesh, P())),
    )
    return fn(init, key)


def run_ghmc_sharded(potential_fn: Callable, init_positions, key,
                     mesh: Mesh, config=None, **kwargs):
    """run_ghmc over the chain mesh.  Fold statistics (ensemble means /
    variances / power-iteration matvecs) are reductions over the sharded
    chain axis — XLA lowers them to psums over ICI; the sequential
    F-fold sweep stays one compiled program."""
    from ..inference import ghmc as G

    config = config or G.GHMCConfig()
    init = shard_chains(mesh, init_positions, axis=0)
    fn = jax.jit(
        lambda i, k: G.run_ghmc(potential_fn, i, k, config, **kwargs),
        in_shardings=(_chain_sharding(mesh, 0), NamedSharding(mesh, P())),
    )
    return fn(init, key)
