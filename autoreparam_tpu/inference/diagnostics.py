"""MCMC diagnostics: ESS, split R-hat, ESS/grad normalisation.

TPU-native replacement for the reference's use of
`tfp.mcmc.effective_sample_size` / `potential_scale_reduction`
(SURVEY.md §3.1 "Diagnostics & persistence") and for the paper's headline
metric, ESS per 1000 gradient evaluations (min across dimensions).

Implementation notes (all pure jnp, jit/vmap-safe):
- Autocovariances via real FFT over the sample axis (O(S log S), runs on
  chip; no host round trips).
- Cross-chain combination follows Vehtari et al. 2021 / Stan: pooled
  within-chain autocovariance + between-chain variance, Geyer initial
  positive+monotone sequence truncation.
- Everything maps over arbitrary trailing dimension axes; the chain axis
  is explicit, so a `shard_map`-sharded caller can pass per-device chain
  blocks and combine with psum (see parallel/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["autocovariance", "effective_sample_size", "ess_from_moments",
           "potential_scale_reduction", "ess_per_grad", "summarize"]


def autocovariance(x, axis: int = 0):
    """Biased autocovariance along `axis` via FFT (dividing by S, as Stan
    does, which already damps large lags)."""
    x = jnp.moveaxis(x, axis, 0)
    S = x.shape[0]
    x = x - jnp.mean(x, axis=0, keepdims=True)
    n_fft = 1
    while n_fft < 2 * S:
        n_fft *= 2
    f = jnp.fft.rfft(x, n=n_fft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=n_fft, axis=0)[:S]
    acov = acov / S
    return jnp.moveaxis(acov, 0, axis)


def potential_scale_reduction(samples):
    """Split R-hat. `samples` has shape (S, C, ...); returns (...)."""
    S, C = samples.shape[0], samples.shape[1]
    half = S // 2
    # Split each chain in two: (half, 2C, ...)
    split = jnp.concatenate([samples[:half], samples[half:2 * half]],
                            axis=1)
    n = half
    chain_mean = jnp.mean(split, axis=0)              # (2C, ...)
    chain_var = jnp.var(split, axis=0, ddof=1)        # (2C, ...)
    W = jnp.mean(chain_var, axis=0)                   # (...)
    B = n * jnp.var(chain_mean, axis=0, ddof=1)       # (...)
    var_hat = (n - 1) / n * W + B / n
    return jnp.sqrt(var_hat / W)


def ess_from_moments(mean_acov, W, B_over_n, S: int, C: int):
    """ESS from pooled moments: `mean_acov` (S, ...) is the cross-chain
    mean autocovariance, `W` the mean within-chain variance, `B_over_n`
    the variance of chain means.  Factored out so the sharded path can
    psum these moments over the device mesh (parallel/) and reuse the
    same Geyer truncation."""
    dtype = mean_acov.dtype
    var_hat = (S - 1.0) / S * W + B_over_n
    rho = 1.0 - (W - mean_acov) / var_hat             # (S, ...)
    # Geyer pairs P_k = rho_{2k} + rho_{2k+1}; drop the last odd lag.
    T = (S // 2) * 2
    pairs = rho[0:T:2] + rho[1:T:2]                   # (T/2, ...)
    # initial positive sequence: zero after the first non-positive pair
    positive = pairs > 0.0
    keep = jnp.cumprod(positive.astype(dtype), axis=0)
    # keep P_0 always (it includes rho_0 = 1)
    keep = keep.at[0].set(1.0)
    # initial monotone sequence: running minimum over kept pairs
    mono = jax.lax.associative_scan(jnp.minimum, jnp.where(
        keep > 0, pairs, jnp.inf), axis=0)
    contrib = jnp.where(keep > 0, jnp.maximum(mono, 0.0), 0.0)
    tau = -1.0 + 2.0 * jnp.sum(contrib, axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.asarray(S * C, dtype))
    ess = S * C / tau
    return jnp.minimum(ess, jnp.asarray(S * C, dtype) * 1.0)


def effective_sample_size(samples):
    """Cross-chain ESS (Vehtari/Stan). `samples`: (S, C, ...) -> (...)."""
    S, C = samples.shape[0], samples.shape[1]
    acov = autocovariance(samples, axis=0)            # (S, C, ...)
    mean_acov = jnp.mean(acov, axis=1)                # (S, ...)
    chain_var = acov[0] * S / (S - 1.0)               # (C, ...) unbiased
    W = jnp.mean(chain_var, axis=0)                   # (...)
    if C > 1:
        chain_mean = jnp.mean(samples, axis=0)        # (C, ...)
        B_over_n = jnp.var(chain_mean, axis=0, ddof=1)
    else:
        B_over_n = jnp.zeros_like(W)
    return ess_from_moments(mean_acov, W, B_over_n, S, C)


def ess_per_grad(ess, num_samples: int, num_leapfrog_steps: int,
                 grad_multiplier: float = 1.0):
    """The paper's normalisation: ESS per 1000 gradient evaluations
    (SURVEY.md §3.1 [H]).  `grad_multiplier` is 2 for interleaved HMC
    (two kernels per outer sample, SURVEY.md §4.3)."""
    total_grads = num_samples * num_leapfrog_steps * grad_multiplier
    return ess * 1000.0 / total_grads


def summarize(samples):
    """Per-dimension posterior summary for (S, C, D) samples."""
    flat = samples.reshape((-1,) + samples.shape[2:])
    return {
        "mean": jnp.mean(flat, axis=0),
        "std": jnp.std(flat, axis=0),
        "ess": effective_sample_size(samples),
        "rhat": potential_scale_reduction(samples),
    }
