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
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["autocovariance", "effective_sample_size", "ess_from_moments",
           "potential_scale_reduction", "nested_rhat", "ebfmi",
           "ess_per_grad",
           "summarize", "rank_normalize", "rhat_rank", "ess_bulk",
           "ess_tail", "summary_table", "format_summary"]


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


def nested_rhat(samples, num_superchains: int):
    """Nested R-hat (Margossian, Hoffman, Sountsov, Riou-Durand, Vehtari,
    Gelman 2024, "Nested R-hat: assessing the convergence of Markov chain
    Monte Carlo when running many short chains").

    Split R-hat needs each chain to be long enough to estimate its own
    variance; at this framework's operating point (thousands of vmapped
    chains, comparatively few kept samples — SURVEY.md §3.3 "chain
    parallelism is the DP axis") that assumption is the weak link.
    Nested R-hat groups the C chains into K superchains of M = C/K
    chains and compares between-SUPERCHAIN variance against the total
    within-superchain variance, which pools M chains' draws — it stays
    well-defined and sharp even at a single kept draw per chain (S = 1,
    M >= 2).

    `samples`: (S, C, ...) -> (...).  Chains are grouped into contiguous
    blocks along the chain axis; if superchains share an initialization
    (the paper's design), lay chains out so each block is one init
    group.  With iid inits (this framework's q*-init default) nested
    R-hat is a lower-noise grouped R-hat and the grouping is arbitrary.

    All variance estimators use biased (1/n) divisors per the paper, so
    nR-hat >= 1 by construction; the recommended bar is tighter than
    split R-hat's (e.g. 1.01, and ~1 + B/(M*S) for bias B of the same
    size as the target's noise floor).
    """
    S, C = samples.shape[0], samples.shape[1]
    K = int(num_superchains)
    if C % K != 0:
        raise ValueError(f"num_superchains={K} must divide C={C}")
    M = C // K
    if S == 1 and M == 1:
        raise ValueError("nested_rhat needs S >= 2 or M >= 2 (a single "
                         "draw per superchain has no within variance)")
    x = samples.reshape((S, K, M) + samples.shape[2:])
    chain_mean = jnp.mean(x, axis=0)                       # (K, M, ...)
    chain_var = jnp.var(x, axis=0)                         # biased; 0 at S=1
    super_mean = jnp.mean(chain_mean, axis=1)              # (K, ...)
    grand = jnp.mean(super_mean, axis=0)                   # (...)
    B_nu = jnp.mean((super_mean - grand) ** 2, axis=0)     # between super
    B_w = jnp.mean((chain_mean - super_mean[:, None]) ** 2,
                   axis=(0, 1))                            # between chains
    W_w = jnp.mean(chain_var, axis=(0, 1))                 # within chains
    W_nu = B_w + W_w
    tiny = jnp.finfo(samples.dtype).tiny
    return jnp.sqrt(1.0 + B_nu / jnp.maximum(W_nu, tiny))


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


def ebfmi(energy):
    """Energy Bayesian fraction of missing information (Betancourt 2016;
    Stan's `E-BFMI`): mean squared energy increment over marginal energy
    variance, per chain.

    `energy`: (S, C) Hamiltonian energies at the END of each transition
    (momentum freshly resampled each step).  Low values (< 0.3, Stan's
    warning bar) mean momentum resampling explores the energy marginal
    much more slowly than the transitions do — the classic heavy-tail /
    funnel failure mode that reparameterisation (NCP/VIP) exists to fix,
    so this is the natural companion diagnostic to this framework.
    Returns (C,).
    """
    dE = jnp.diff(energy, axis=0)
    num = jnp.mean(dE * dE, axis=0)
    den = jnp.var(energy, axis=0)
    tiny = jnp.finfo(energy.dtype).tiny
    return num / jnp.maximum(den, tiny)


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


# -- rank-normalized diagnostics (Vehtari, Gelman, Simpson, Carpenter,
#    Bürkner 2021, "Rank-normalization, folding, and localization") ----


def rank_normalize(samples):
    """Fractional-offset rank-normal transform, pooled over (S, C) per
    dimension: z = Φ⁻¹((rank − 3/8) / (N + 1/4)).

    Ordinal ranks (argsort of argsort) — MCMC float draws tie with
    probability ~0, so average-rank tie handling is not implemented.
    Makes the classical R-hat/ESS machinery robust to heavy tails and
    non-Gaussian margins (they then measure rank mixing, which always
    has finite moments).
    """
    S, C = samples.shape[0], samples.shape[1]
    N = S * C
    flat = samples.reshape((N,) + samples.shape[2:])
    ranks = jnp.argsort(jnp.argsort(flat, axis=0), axis=0)
    u = (ranks + 1.0 - 0.375) / (N + 0.25)
    z = jax.scipy.special.ndtri(u.astype(flat.dtype))
    return z.reshape(samples.shape)


def rhat_rank(samples):
    """Rank-normalized split-R-hat: max over the bulk transform and the
    folded (|x − median|) transform — the folded half detects chains
    agreeing in location but not in scale.  The recommended modern
    convergence bar is rhat_rank < 1.01."""
    bulk = potential_scale_reduction(rank_normalize(samples))
    flat = samples.reshape((-1,) + samples.shape[2:])
    folded = jnp.abs(samples - jnp.median(flat, axis=0))
    fold = potential_scale_reduction(rank_normalize(folded))
    return jnp.maximum(bulk, fold)


def ess_bulk(samples, **kwargs):
    """Bulk-ESS: classical cross-chain ESS of the rank-normalized
    draws — mixing of the distribution's body, finite-moment-free."""
    return effective_sample_size(rank_normalize(samples), **kwargs)


def ess_tail(samples, prob: float = 0.05, **kwargs):
    """Tail-ESS: the minimum of the ESS of the two tail-indicator
    series I(x ≤ q_prob) and I(x ≤ q_{1−prob}) — how well the chains
    resolve the tails (credible-interval endpoints converge at this
    rate, not at the bulk rate)."""
    flat = samples.reshape((-1,) + samples.shape[2:])
    q_lo = jnp.quantile(flat, prob, axis=0)
    q_hi = jnp.quantile(flat, 1.0 - prob, axis=0)
    dtype = samples.dtype
    e_lo = effective_sample_size(
        (samples <= q_lo).astype(dtype), **kwargs)
    e_hi = effective_sample_size(
        (samples <= q_hi).astype(dtype), **kwargs)
    return jnp.minimum(e_lo, e_hi)


def summary_table(samples, names=None, ci_prob: float = 0.9,
                  num_grads: Optional[float] = None):
    """Per-variable summary rows for (S, C, D) samples (Stan `stansummary`
    / posterior-package style): mean, MCSE, sd, equal-tailed credible
    interval, bulk/tail ESS, rank-normalized R-hat.

    `names` labels the D columns (defaults to dim{i}); `num_grads`
    (total gradient evaluations) adds the paper's ess/1000-grad column.
    Returns a list of dict rows (JSON-ready); `format_summary` renders
    them as an aligned text table.
    """
    import numpy as np

    S, C, D = samples.shape
    flat = np.asarray(samples.reshape(S * C, D))
    lo_p, hi_p = (1.0 - ci_prob) / 2.0, 1.0 - (1.0 - ci_prob) / 2.0
    mean = flat.mean(0)
    sd = flat.std(0)
    q_lo = np.quantile(flat, lo_p, axis=0)
    q_hi = np.quantile(flat, hi_p, axis=0)
    bulk = np.asarray(ess_bulk(samples))
    tail = np.asarray(ess_tail(samples))
    rhat = np.asarray(rhat_rank(samples))
    mcse = sd / np.sqrt(np.maximum(bulk, 1.0))
    if names is None:
        names = [f"dim{i}" for i in range(D)]
    rows = []
    for i in range(D):
        row = {
            "name": str(names[i]),
            "mean": float(mean[i]), "mcse_mean": float(mcse[i]),
            "sd": float(sd[i]),
            f"q{lo_p * 100:g}": float(q_lo[i]),
            f"q{hi_p * 100:g}": float(q_hi[i]),
            "ess_bulk": float(bulk[i]), "ess_tail": float(tail[i]),
            "rhat": float(rhat[i]),
        }
        if num_grads:
            row["ess_per_kgrad"] = float(bulk[i] * 1000.0 / num_grads)
        rows.append(row)
    return rows


def format_summary(rows) -> str:
    """Render `summary_table` rows as an aligned text table."""
    if not rows:
        return "(no variables)"
    cols = list(rows[0].keys())

    def fmt(v):
        if isinstance(v, str):
            return v
        if abs(v) >= 1e4 or (v != 0 and abs(v) < 1e-3):
            return f"{v:.2e}"
        return f"{v:.3f}" if abs(v) < 100 else f"{v:.1f}"

    table = [[fmt(r[c]) for c in cols] for r in rows]
    widths = [max(len(c), *(len(t[j]) for t in table))
              for j, c in enumerate(cols)]
    lines = ["  ".join(c.ljust(w) for c, w in zip(cols, widths))]
    for t in table:
        lines.append("  ".join(v.rjust(w) if i else v.ljust(w)
                               for i, (v, w) in enumerate(zip(t, widths))))
    return "\n".join(lines)
