"""Model comparison: WAIC and PSIS-LOO from pointwise log-likelihoods.

Completes the workflow `core.predictive.pointwise_log_likelihood` feeds
(the reference has nothing here — its comparisons are ESS tables; this
is framework-completeness for the PPL user switching from any modern
toolkit).  Everything is one vmapped/jitted program over datapoints:

- `waic(loglik)` — Watanabe-Akaike / widely-applicable information
  criterion: elpd̂ = Σ_i [log mean_s p_is − var_s(log p_is)].
- `loo(loglik)` — Pareto-smoothed importance-sampling leave-one-out
  (Vehtari, Gelman & Gabry 2017): per-datapoint importance ratios
  r_is ∝ 1/p_is, the largest M = min(0.2·S, 3·√S) smoothed by a
  generalized-Pareto fit (Zhang & Stephens 2009 posterior-mean
  estimator, arviz-style k̂ regularization), with the per-datapoint
  Pareto k̂ returned as the reliability diagnostic (k̂ > 0.7 ⇒ that
  point's LOO estimate is unreliable).

`loglik` is (num_draws, num_datapoints) — e.g.
`pointwise_log_likelihood(...)[site].reshape(S*C, -1)`.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["waic", "loo", "compare", "WaicResult", "LooResult"]


class WaicResult(NamedTuple):
    elpd: jnp.ndarray        # scalar: Σ_i elpd_i
    se: jnp.ndarray          # scalar: √(n · var_i(elpd_i))
    p_eff: jnp.ndarray       # effective number of parameters
    elpd_pointwise: jnp.ndarray   # (n,)


class LooResult(NamedTuple):
    elpd: jnp.ndarray
    se: jnp.ndarray
    p_eff: jnp.ndarray
    elpd_pointwise: jnp.ndarray   # (n,)
    pareto_k: jnp.ndarray         # (n,) GPD shape diagnostic per point


def waic(loglik) -> WaicResult:
    """WAIC from a (num_draws, n) pointwise log-likelihood matrix."""
    loglik = jnp.asarray(loglik)
    S = loglik.shape[0]
    lpd = jax.nn.logsumexp(loglik, axis=0) - math.log(S)      # (n,)
    p = jnp.var(loglik, axis=0, ddof=1)                       # (n,)
    elpd_i = lpd - p
    n = elpd_i.shape[0]
    se = jnp.sqrt(n * jnp.var(elpd_i, ddof=1))
    return WaicResult(elpd=jnp.sum(elpd_i), se=se, p_eff=jnp.sum(p),
                      elpd_pointwise=elpd_i)


def _fit_gpd_k(x):
    """Zhang & Stephens (2009) posterior-mean fit of the generalized
    Pareto shape k (and scale) to exceedances x > 0; returns (k, sigma).
    Fully vectorized (a θ-grid profile likelihood), so it vmaps over
    datapoints."""
    n = x.shape[0]
    m_grid = 30 + int(math.isqrt(n))
    j = jnp.arange(1.0, m_grid + 1.0)
    x_star = jnp.quantile(x, 0.25)
    theta = (1.0 / jnp.max(x)
             + (1.0 - jnp.sqrt(m_grid / (j - 0.5))) / (3.0 * x_star))
    # Zhang & Stephens' internal shape is the NEGATIVE of the usual GPD
    # ξ (their cdf is 1 − (1 − θx)^{1/k}); the profile likelihood below
    # is written in their convention, and we flip to ξ at the end —
    # getting this sign wrong inverts the heavy-tail diagnostic
    # (measured: ξ̂ = −4.1 on data whose scipy genpareto MLE is +4.3).
    k_j = -jnp.mean(jnp.log1p(-theta[:, None] * x[None, :]), axis=1)
    log_lik = n * (jnp.log(theta / k_j) + k_j - 1.0)
    w = jax.nn.softmax(log_lik)
    theta_hat = jnp.sum(w * theta)
    xi = jnp.mean(jnp.log1p(-theta_hat * x))     # usual GPD shape
    sigma = -xi / theta_hat
    # arviz-style regularization: shrink ξ toward 0.5 with prior weight
    # 10 (stabilizes small tails)
    xi = (n * xi + 5.0) / (n + 10.0)
    return xi, sigma


def _psis_one(neg_ll, tail: int):
    """Smooth one datapoint's log importance ratios (= -loglik, up to a
    constant) and return (normalized log weights, pareto_k)."""
    lr = neg_ll - jnp.max(neg_ll)
    S = lr.shape[0]
    order = jnp.argsort(lr)
    lr_sorted = lr[order]
    cut = lr_sorted[S - tail - 1]                  # tail threshold (log)
    r_tail = jnp.exp(lr_sorted[S - tail:])
    u = jnp.exp(cut)
    k, sigma = _fit_gpd_k(r_tail - u)
    # replace tail with GPD quantiles at (j - 0.5)/M, capped at the raw
    # maximum (weights never exceed the largest observed ratio)
    p = (jnp.arange(1.0, tail + 1.0) - 0.5) / tail
    q = u + jnp.where(jnp.abs(k) > 1e-6,
                      sigma / k * (jnp.power(1.0 - p, -k) - 1.0),
                      -sigma * jnp.log1p(-p))    # ξ→0: exponential tail
    q = jnp.minimum(q, jnp.exp(lr_sorted[-1]))
    lr_smoothed = lr_sorted.at[S - tail:].set(jnp.log(q))
    # undo the sort
    lw = jnp.zeros_like(lr).at[order].set(lr_smoothed)
    lw = lw - jax.nn.logsumexp(lw)
    return lw, k


def loo(loglik) -> LooResult:
    """PSIS-LOO from a (num_draws, n) pointwise log-likelihood matrix."""
    loglik = jnp.asarray(loglik)
    S, n = loglik.shape
    tail = max(5, int(min(0.2 * S, 3.0 * math.sqrt(S))))
    if S <= tail + 1:
        raise ValueError(f"need more than {tail + 1} draws, got {S}")

    def one(ll_col):
        lw, k = _psis_one(-ll_col, tail)
        elpd_i = jax.nn.logsumexp(lw + ll_col)
        return elpd_i, k

    elpd_i, ks = jax.vmap(one, in_axes=1)(loglik)
    lpd = jax.nn.logsumexp(loglik, axis=0) - math.log(S)
    se = jnp.sqrt(n * jnp.var(elpd_i, ddof=1))
    return LooResult(elpd=jnp.sum(elpd_i), se=se,
                     p_eff=jnp.sum(lpd - elpd_i),
                     elpd_pointwise=elpd_i, pareto_k=ks)


def compare(results: dict) -> list:
    """Rank models by elpd with PAIRED difference standard errors.

    `results` maps model name -> LooResult/WaicResult (same datapoints
    for every model).  Returns a list of dicts sorted best-first with
    `elpd`, `elpd_diff` (vs the best), and `diff_se` — the SE of the
    POINTWISE difference, which is the statistically meaningful one
    (the per-model SEs are correlated through the shared data)."""
    if not results:
        return []
    names = sorted(results, key=lambda k: -float(results[k].elpd))
    best = results[names[0]].elpd_pointwise
    out = []
    for name in names:
        r = results[name]
        d = best - r.elpd_pointwise
        n = d.shape[0]
        out.append({
            "model": name,
            "elpd": float(r.elpd),
            "se": float(r.se),
            "elpd_diff": float(jnp.sum(d)),
            "diff_se": float(jnp.sqrt(n * jnp.var(d, ddof=1))),
        })
    return out
