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

import functools

import jax
import jax.numpy as jnp

__all__ = ["autocovariance", "effective_sample_size", "ess_from_moments",
           "potential_scale_reduction", "ess_per_grad", "summarize"]


def autocovariance(x, axis: int = 0, max_lags: int = None):
    """Biased autocovariance along `axis` (dividing by S, as Stan does,
    which already damps large lags).

    Two paths:
    - `max_lags=None`: full FFT autocovariance, O(S log S) — exact but
      the padded complex intermediates are the memory/time hog at 8k+
      chains on TPU.
    - `max_lags=K`: direct lagged products for lags 0..K, O(S·K) pure
      VPU work with O(1) extra memory — the TPU-native fast path.
      Valid whenever chains mix faster than K lags (the Geyer truncation
      then falls inside the window; summarize() uses this).
    """
    x = jnp.moveaxis(x, axis, 0)
    S = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    if max_lags is None:
        n_fft = 1
        while n_fft < 2 * S:
            n_fft *= 2
        f = jnp.fft.rfft(xc, n=n_fft, axis=0)
        acov = jnp.fft.irfft(f * jnp.conj(f), n=n_fft, axis=0)[:S]
        acov = acov / S
    else:
        K = min(max_lags, S - 1)
        acov = _direct_acov(xc, K)                    # (K+1, ...)
    return jnp.moveaxis(acov, 0, axis)


@functools.partial(jax.jit, static_argnums=(1,))
def _direct_acov(xc, K: int):
    """All lags 0..K as ONE grouped 1-D self-correlation.

    acov_k = Σ_t x_t·x_{t+k} is a correlation of each series with
    itself; expressing it as `lax.conv_general_dilated` with one feature
    group per series lets XLA lower the whole thing onto the MXU in a
    single kernel.  (Earlier formulations — a Python loop of eager ops,
    or a scan of rolls — were dispatch-bound / badly tiled on TPU.)
    """
    S = xc.shape[0]
    trailing = xc.shape[1:]
    B = 1
    for d in trailing:
        B *= d
    x2 = xc.reshape(S, B).T                       # (B, S)
    lhs = jnp.pad(x2, ((0, 0), (0, K)))[None]     # (1, B, S+K)
    rhs = x2[:, None, :]                          # (B, 1, S)
    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        feature_group_count=B,
        preferred_element_type=jnp.float32,
    )                                             # (1, B, K+1)
    acov = out[0].T / S                           # (K+1, B)
    return acov.reshape((K + 1,) + trailing)


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
    rho = 1.0 - (W - mean_acov) / var_hat             # (L, ...), L <= S
    # Geyer pairs P_k = rho_{2k} + rho_{2k+1}; drop the last odd lag.
    # (L < S when the autocovariance was lag-truncated; valid as long as
    # the Geyer cutoff lands inside the window.)
    T = (min(mean_acov.shape[0], S) // 2) * 2
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
    # Antithetic (super-efficient) chains legitimately have ESS > N;
    # follow Stan's bound ESS <= N*log10(N) instead of a hard N cap so
    # well-jittered chains aren't silently understated (tfp.mcmc applies
    # no cap at all).
    n = jnp.asarray(S * C, dtype)
    return jnp.minimum(ess, n * jnp.maximum(jnp.log10(n), 1.0))


def effective_sample_size(samples, chain_chunk: int = 512,
                          max_lags: int = None):
    """Cross-chain ESS (Vehtari/Stan). `samples`: (S, C, ...) -> (...).

    Memory strategy (SURVEY.md §8.3 #3): with `max_lags=K` the
    autocovariance is computed by direct lagged products — O(1) extra
    memory at any chain count, the TPU fast path for well-mixing chains.
    With `max_lags=None` (exact), the per-chain FFT is the memory hog at
    scale (8192 chains × padded-2S fft length × dims of complex64), so
    chains are processed in blocks of `chain_chunk` with a `lax.map`
    accumulation; only the pooled (S, ...) moments persist.
    """
    S, C = samples.shape[0], samples.shape[1]
    if C > 1:
        chain_mean = jnp.mean(samples, axis=0)        # (C, ...)
        B_over_n = jnp.var(chain_mean, axis=0, ddof=1)
    else:
        B_over_n = None

    if max_lags is not None:
        # the direct-lag path is O(1) in EXTRA memory but its grouped
        # conv still materializes (C·dims, S+K) operands; both outputs
        # are plain chain-sums, so large chain counts go through the
        # same block accumulation as the FFT path
        if C > chain_chunk and C % chain_chunk == 0:
            n_blocks = C // chain_chunk
            blocks = jnp.moveaxis(
                samples.reshape((S, n_blocks, chain_chunk)
                                + samples.shape[2:]), 1, 0)

            def block_moments_k(block):               # (S, chunk, ...)
                acov = autocovariance(block, axis=0, max_lags=max_lags)
                return (jnp.sum(acov, axis=1),
                        jnp.sum(acov[0] * S / (S - 1.0), axis=0))

            sum_acov_b, sum_w_b = jax.lax.map(block_moments_k, blocks)
            sum_acov = jnp.sum(sum_acov_b, axis=0)
            sum_w = jnp.sum(sum_w_b, axis=0)
        else:
            acov = autocovariance(samples, axis=0, max_lags=max_lags)
            sum_acov = jnp.sum(acov, axis=1)
            sum_w = jnp.sum(acov[0] * S / (S - 1.0), axis=0)
    elif C <= chain_chunk or C % chain_chunk != 0:
        acov = autocovariance(samples, axis=0)        # (S, C, ...)
        sum_acov = jnp.sum(acov, axis=1)
        sum_w = jnp.sum(acov[0] * S / (S - 1.0), axis=0)
    else:
        n_blocks = C // chain_chunk
        blocks = jnp.moveaxis(
            samples.reshape((S, n_blocks, chain_chunk)
                            + samples.shape[2:]), 1, 0)

        def block_moments(block):                     # (S, chunk, ...)
            acov = autocovariance(block, axis=0)
            return (jnp.sum(acov, axis=1),
                    jnp.sum(acov[0] * S / (S - 1.0), axis=0))

        sum_acov_b, sum_w_b = jax.lax.map(block_moments, blocks)
        sum_acov = jnp.sum(sum_acov_b, axis=0)
        sum_w = jnp.sum(sum_w_b, axis=0)

    mean_acov = sum_acov / C
    W = sum_w / C
    if B_over_n is None:
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
