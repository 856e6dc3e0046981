"""Cross-chain collectives: pooled diagnostics over the device mesh.

TPU-native replacement for what the reference never had (SURVEY.md §3.4):
ESS and R-hat need cross-chain moments; when chains are sharded over the
mesh these are computed per-device and combined with `psum` over ICI
inside `shard_map` — samples never leave their device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..inference import diagnostics as dg
from .mesh import CHAIN_AXIS, chain_axes

__all__ = ["sharded_effective_sample_size",
           "sharded_potential_scale_reduction",
           "sharded_nested_rhat",
           "sharded_mean"]


def sharded_effective_sample_size(samples, mesh: Mesh):
    """Cross-chain ESS for (S, C, ...) samples sharded on the chain axis.

    Per-device: local autocovariances and chain moments.  psum over ICI:
    the pooled mean autocovariance, within-chain variance W, and chain-
    mean moments.  Then the shared Geyer truncation (diagnostics.py).
    """
    S, C = samples.shape[0], samples.shape[1]
    ax = chain_axes(mesh)  # all mesh axes (1-D or hierarchical dcn x ici)

    @partial(shard_map, mesh=mesh,
             in_specs=P(None, ax),
             out_specs=P())
    def pooled_moments(block):  # (S, C/n, ...)
        acov = dg.autocovariance(block, axis=0)
        sum_acov = jnp.sum(acov, axis=1)                 # (S, ...)
        chain_var = acov[0] * S / (S - 1.0)
        sum_w = jnp.sum(chain_var, axis=0)
        chain_mean = jnp.mean(block, axis=0)
        sum_acov = jax.lax.psum(sum_acov, ax)
        sum_w = jax.lax.psum(sum_w, ax)
        # B/n as a *pre-centered* second moment: psum the global mean
        # first, then psum squared deviations from it — the
        # sum-of-squares-minus-mean form cancels catastrophically in f32
        # when chain means sit far from zero (e.g. electric's a ~
        # N(100·mua, ·)), diverging from the unsharded jnp.var path.
        mean_m = jax.lax.psum(jnp.sum(chain_mean, axis=0), ax) / C
        sum_c2 = jax.lax.psum(
            jnp.sum((chain_mean - mean_m) ** 2, axis=0), ax)
        return sum_acov, sum_w, sum_c2

    sum_acov, sum_w, sum_c2 = pooled_moments(samples)
    mean_acov = sum_acov / C
    W = sum_w / C
    if C > 1:
        B_over_n = sum_c2 / (C - 1.0)
    else:
        B_over_n = jnp.zeros_like(W)
    return dg.ess_from_moments(mean_acov, W, B_over_n, S, C)


def sharded_potential_scale_reduction(samples, mesh: Mesh):
    """Split R-hat with chains sharded on axis 1 of (S, C, ...)."""
    S, C = samples.shape[0], samples.shape[1]
    half = S // 2

    m = 2 * C  # split chains
    ax = chain_axes(mesh)

    @partial(shard_map, mesh=mesh,
             in_specs=P(None, ax),
             out_specs=P())
    def pooled(block):
        split = jnp.concatenate([block[:half], block[half:2 * half]],
                                axis=1)                    # (half, 2C/n, ...)
        cm = jnp.mean(split, axis=0)
        cv = jnp.var(split, axis=0, ddof=1)
        sum_w = jax.lax.psum(jnp.sum(cv, axis=0), ax)
        # pre-centered between-chain moment (see ESS note above)
        mean_m = jax.lax.psum(jnp.sum(cm, axis=0), ax) / m
        sum_c2 = jax.lax.psum(jnp.sum((cm - mean_m) ** 2, axis=0), ax)
        return sum_w, sum_c2

    sum_w, sum_c2 = pooled(samples)
    W = sum_w / m
    B = half * sum_c2 / (m - 1.0)
    var_hat = (half - 1.0) / half * W + B / half
    return jnp.sqrt(var_hat / W)


def sharded_nested_rhat(samples, mesh: Mesh, superchains_per_device: int = 1):
    """Nested R-hat (diagnostics.nested_rhat) with chains sharded on
    axis 1 of (S, C, ...).

    Superchains align with the sharding: each device's chain block is
    split into `superchains_per_device` contiguous superchains, so the
    within-superchain moments are device-local and only three pooled
    (...)-shaped moments cross ICI — samples never leave their device.
    K = n_devices * superchains_per_device total superchains.
    """
    S, C = samples.shape[0], samples.shape[1]
    n_dev = mesh.size
    kpd = int(superchains_per_device)
    K = n_dev * kpd
    if C % K != 0:
        raise ValueError(f"K={K} superchains must divide C={C}")
    M = C // K
    if S == 1 and M == 1:
        raise ValueError("nested_rhat needs S >= 2 or M >= 2")
    ax = chain_axes(mesh)

    @partial(shard_map, mesh=mesh,
             in_specs=P(None, ax),
             out_specs=(P(), P(), P()))
    def pooled(block):  # (S, C/n_dev, ...)
        x = block.reshape((S, kpd, M) + block.shape[2:])
        chain_mean = jnp.mean(x, axis=0)                   # (kpd, M, ...)
        chain_var = jnp.var(x, axis=0)
        super_mean = jnp.mean(chain_mean, axis=1)          # (kpd, ...)
        sum_bw = jnp.sum((chain_mean - super_mean[:, None]) ** 2,
                         axis=(0, 1))
        sum_ww = jnp.sum(chain_var, axis=(0, 1))
        # pre-centered between-superchain moment (see ESS note above)
        grand = jax.lax.psum(jnp.sum(super_mean, axis=0), ax) / K
        sum_b = jax.lax.psum(jnp.sum((super_mean - grand) ** 2, axis=0),
                             ax)
        return (sum_b,
                jax.lax.psum(sum_bw, ax),
                jax.lax.psum(sum_ww, ax))

    sum_b, sum_bw, sum_ww = pooled(samples)
    B_nu = sum_b / K
    W_nu = sum_bw / (K * M) + sum_ww / (K * M)
    tiny = jnp.finfo(samples.dtype).tiny
    return jnp.sqrt(1.0 + B_nu / jnp.maximum(W_nu, tiny))


def sharded_mean(x, mesh: Mesh, chain_axis: int = 0):
    """Mean over a sharded chain axis (pooled acceptance stats etc.)."""
    ax = chain_axes(mesh)
    spec = [None] * x.ndim
    spec[chain_axis] = ax
    n = x.shape[chain_axis]

    @partial(shard_map, mesh=mesh, in_specs=P(*spec), out_specs=P())
    def f(block):
        return jax.lax.psum(jnp.sum(block, axis=chain_axis), ax) / n

    return f(x)
