"""Generalized HMC with MEADS-style cross-fold ensemble adaptation.

Beyond-the-reference engine (the reference hand-tunes
--num_leapfrog_steps per model; SURVEY.md §3.1).  Generalized /
Horowitz HMC makes ONE leapfrog step per proposal with a PARTIALLY
refreshed (persistent) momentum — r ← α·r + √(1−α²)·ξ — and negates
the momentum on rejection, so trajectories extend across proposals
without a NUTS tree or a tuned L.  Every step costs exactly one
gradient and every chain takes exactly the same instruction stream (no
per-chain or even per-iteration trip counts — ChEES still needs a
shared dynamic loop bound), which makes it the most TPU-shaped engine
here.

Hyperparameters (ε, damping γ, diagonal preconditioner) are tuned the
MEADS way (Hoffman & Sountsov, AISTATS 2022, "Tuning-Free Generalized
Hamiltonian Monte Carlo"): the chain ensemble is split into F folds and
fold f's hyperparameters are computed from the CURRENT states of fold
f−1 only — a chain's own history never tunes its own kernel, so
adaptation can continue through the sampling phase (no frozen-warmup /
sampling split at all).  Per fold, from the complementary fold's states
z and gradients g:

- preconditioner   M⁻¹ = Var_ensemble(z)        (per-dimension)
- step size        ε = a / √λ̂_max(Cov(σ ∘ g)),  σ = √M⁻¹
  (for a Gaussian target Cov of the preconditioned gradient IS the
  preconditioned Hessian, whose top eigenvalue bounds leapfrog
  stability; λ̂ via one streaming power-iteration update per step —
  two (N, D) matmuls per fold, MXU work)
- damping          γ = b·ε / √λ̂_max(Cov(z / σ))
  (the slowest preconditioned direction sets how long momentum must
  persist: γ ≈ ε/ℓ_max gives an integrated trajectory ~ ℓ_max)

Exactness does NOT rest on these heuristics: the Metropolis step with
momentum flip is exact for ANY (ε, α, M) that is independent of the
chain's own state, which the fold separation guarantees; the constants
only affect efficiency.  The flip-on-reject detailed balance is pinned
by a rank-uniformity (SBC) test with fixed hyperparameters, and the
adaptive ensemble by posterior-moment tests (tests/test_ghmc.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import hmc as H

__all__ = ["GHMCConfig", "run_ghmc", "sample_ghmc", "ghmc_kernel"]


class GHMCConfig(NamedTuple):
    num_warmup: int = 1000
    num_samples: int = 2000
    #: a in ε = a/√λ_max — 0.5 keeps well inside the leapfrog stability
    #: limit 2/√λ_max while the estimate is noisy
    step_scale: float = 0.5
    #: b in γ = b·ε/√λ_max(Cov x̂)
    damping_scale: float = 1.0
    num_folds: int = 4
    #: EMA for the streaming power-iteration eigvector/eigvalue
    pi_ema: float = 0.9
    #: floor for the ensemble variance (degenerate dims / cold starts)
    var_floor: float = 1e-8
    max_step_size: float = 2.0
    min_damping: float = 1e-3
    divergence_threshold: float = 1000.0
    thin: int = 1


class GHMCState(NamedTuple):
    z: jnp.ndarray      # (C, D)
    r: jnp.ndarray      # (C, D) persistent momentum, N(0, I) marginally
    pot: jnp.ndarray    # (C,)
    grad: jnp.ndarray   # (C, D)


def ghmc_kernel(potential_fn: Callable,
                divergence_threshold: float = 1000.0,
                _flip_on_reject: bool = True):
    """One generalized-HMC transition for a batch of chains.

    `one_step(state, key, eps, noise, sqrt_inv_mass) -> (state, info)`
    with eps/noise (C,) and sqrt_inv_mass (C, D).  Momentum is kept in
    the STANDARDIZED space (r ~ N(0, I); the preconditioner enters the
    drift as ε·σ·r and the kick as ε·σ·g), so partial refresh never
    needs the mass matrix and a fold's changing preconditioner does not
    disturb the persistent momentum's stationary law.
    """

    pg = jax.vmap(jax.value_and_grad(potential_fn))

    def one_step(state: GHMCState, key, eps, noise, sqrt_inv_mass):
        k_noise, k_acc = jax.random.split(key)
        # partial refresh: exact N(0, I) invariance for any noise∈[0,1]
        xi = jax.random.normal(k_noise, state.r.shape, state.r.dtype)
        alpha = jnp.sqrt(jnp.maximum(1.0 - noise, 0.0))[:, None]
        r = alpha * state.r + jnp.sqrt(
            jnp.maximum(noise, 0.0))[:, None] * xi

        e = eps[:, None]
        # one leapfrog step in standardized momentum coordinates
        r_half = r - 0.5 * e * sqrt_inv_mass * state.grad
        z_new = state.z + e * sqrt_inv_mass * r_half
        pot_new, grad_new = pg(z_new)
        r_new = r_half - 0.5 * e * sqrt_inv_mass * grad_new

        energy0 = state.pot + 0.5 * jnp.sum(r * r, axis=-1)
        energy1 = pot_new + 0.5 * jnp.sum(r_new * r_new, axis=-1)
        delta = energy0 - energy1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0)))
        is_divergent = -delta > divergence_threshold
        u = jax.random.uniform(k_acc, accept_prob.shape)
        accept = u < accept_prob
        acc2 = accept[:, None]
        new_state = GHMCState(
            z=jnp.where(acc2, z_new, state.z),
            # momentum FLIP on rejection: required for detailed balance
            # under partial refresh (Horowitz 1991).  _flip_on_reject
            # exists ONLY so the test suite can prove it has the power
            # to catch this bug class (measured: dropping the flip
            # biases an asymmetric target's mean by ~67 standard
            # errors; tests/test_ghmc.py)
            r=jnp.where(acc2, r_new, -r if _flip_on_reject else r),
            pot=jnp.where(accept, pot_new, state.pot),
            grad=jnp.where(acc2, grad_new, state.grad),
        )
        info = H.HMCInfo(accept_prob=accept_prob, is_accepted=accept,
                         is_divergent=is_divergent, energy=energy1,
                         step_size=eps)
        return new_state, info

    return one_step


class _FoldAdapt(NamedTuple):
    v_g: jnp.ndarray       # (F, D) power-iteration vector, grad cov
    v_z: jnp.ndarray       # (F, D) power-iteration vector, state cov
    lam_g: jnp.ndarray     # (F,) running top eigenvalue, grad cov
    lam_z: jnp.ndarray     # (F,) running top eigenvalue, state cov
    var: jnp.ndarray       # (F, D) running ensemble variance


def _one_fold_stats(z, grad, adapt: _FoldAdapt, src: int,
                    cfg: GHMCConfig):
    """Streaming update of fold `src`'s ensemble statistics from its
    current states z/grad (N, D); returns (new adapt, (eps, noise,
    sqrt_inv_mass)) — the hyperparameters the NEXT fold runs with."""
    em = cfg.pi_ema
    n = z.shape[0]
    zc = z - jnp.mean(z, axis=0, keepdims=True)
    var = em * adapt.var[src] + (1.0 - em) * (
        jnp.mean(zc * zc, axis=0) + cfg.var_floor)          # (D,)
    sig = jnp.sqrt(var)

    def top_eig(mat, v):
        # one power-iteration step on Cov = matᵀmat/n, streaming in v
        u = mat.T @ (mat @ v) / n
        lam = jnp.linalg.norm(u)
        return lam, u / (lam + 1e-20)

    # NOTE: deliberately NOT winsorized.  One badly-placed chain (a
    # wide-prior NCP start, |grad| ~ 1e5 measured on eight_schools)
    # does own λ̂_max and pushes the dependent fold's ε to ~1e-5 — but
    # capping gradient rows here measurably costs healthy targets
    # (radon cVIP 3-seed median 2058 uncapped vs 1159-1513 ess/grad
    # with 3-10x-median caps, and a 3x cap itself produced an R-hat
    # 1.34 seed).  The pathology is instead healed where it arises:
    # the warmup backoff multiplier (see _make_sweep) lets healthy
    # chains in a poisoned fold ramp their own ε back up while the bad
    # chain crawls down its gradient — after which this estimator's
    # EMA recovers on its own.
    gp = (grad - jnp.mean(grad, axis=0, keepdims=True)) * sig
    xp = zc / sig
    lam_g_now, v_g = top_eig(gp, adapt.v_g[src])
    lam_z_now, v_z = top_eig(xp, adapt.v_z[src])
    lam_g = em * adapt.lam_g[src] + (1.0 - em) * lam_g_now
    lam_z = em * adapt.lam_z[src] + (1.0 - em) * lam_z_now

    eps = jnp.minimum(cfg.step_scale * jax.lax.rsqrt(lam_g + 1e-12),
                      cfg.max_step_size)
    noise = jnp.clip(cfg.damping_scale * eps
                     * jax.lax.rsqrt(lam_z + 1e-12),
                     cfg.min_damping, 1.0)

    new_adapt = _FoldAdapt(v_g=adapt.v_g.at[src].set(v_g),
                           v_z=adapt.v_z.at[src].set(v_z),
                           lam_g=adapt.lam_g.at[src].set(lam_g),
                           lam_z=adapt.lam_z.at[src].set(lam_z),
                           var=adapt.var.at[src].set(var))
    return new_adapt, (eps, noise, sig)


def _make_sweep(kern, config: GHMCConfig, C: int, D: int,
                backoff: bool = False, mult_const=None):
    """Build one full fold sweep: (state, adapt[, mult]), key ->
    ((state, adapt[, mult]), info).

    SEQUENTIAL fold sweep (emcee-style red-black generalized to F
    folds): fold f's hyperparameters come from fold f−1's CURRENT
    state, and folds move one at a time — simultaneous updates with
    cross-dependent parameters are the classic ensemble-MCMC
    detailed-balance pitfall.  F is static, so this unrolls into one
    compiled program; each fold's kernel is still a (C/F)-wide batch.

    `backoff=True` (WARMUP ONLY — own-chain feedback breaks exactness,
    which is fine while samples are discarded) threads a per-chain step
    multiplier through the carry: a chain that keeps rejecting backs
    its ε off geometrically until it can move (a badly-initialized
    wide-prior NCP chain needs ε orders of magnitude below its fold's
    — measured on eight_schools), and recovers toward 1 as it accepts.

    `mult_const` (SAMPLING) applies a FROZEN per-chain multiplier — the
    warmup backoff's end state.  The MEADS ε heuristic can be
    structurally ~100x conservative (election88-NCP measured: sampling
    acceptance 0.95 at ε ~2e-4 while the warmup multiplier had ramped
    to reach its 91%-acceptance equilibrium; dropping it at the
    boundary froze the chains — ess_min pinned at C/2, R-hat 100-700,
    results/probe_ghmc_election.json).  A constant multiplier is
    exact: each chain's kernel parameters stay independent of its own
    state.
    """
    F = config.num_folds
    N = C // F
    multc = (None if mult_const is None
             else jnp.asarray(mult_const).reshape(F, N))

    def one(carry, key):
        if backoff:
            state, adapt, mult = carry
            multp = mult.reshape(F, N)
        else:
            state, adapt = carry
        keys = jax.random.split(key, F)
        parts = jax.tree.map(
            lambda a: a.reshape((F, N) + a.shape[1:]), state)
        infos = []
        for f in range(F):
            src = (f - 1) % F
            sub_src = jax.tree.map(lambda a: a[src], parts)
            adapt, (eps, noise, sig) = _one_fold_stats(
                sub_src.z, sub_src.grad, adapt, src, config)
            sub = jax.tree.map(lambda a: a[f], parts)
            eps_c = jnp.broadcast_to(eps, (N,))
            if backoff:
                eps_c = eps_c * multp[f]
            elif multc is not None:
                eps_c = eps_c * multc[f]
            sub, info = kern(sub, keys[f], eps_c,
                             jnp.broadcast_to(noise, (N,)),
                             jnp.broadcast_to(sig, (N, D)))
            if backoff:
                # equilibrates at ~91% acceptance (ln0.9/(ln0.9-ln1.01))
                # — GHMC wants high acceptance (a rejection flips the
                # persistent momentum).  Upper range >> 1 lets healthy
                # chains ESCAPE a fold whose ε was poisoned by one
                # stuck chain's 1e5 gradient in the λ̂_max estimate.
                # (A slower 1.002 up-rate was tried for a gentler
                # equilibrium and broke warmup's rescue role: chains
                # knocked to 1e-5 early could not climb back within
                # the budget — eight_schools R-hat 4.4.)
                multp = multp.at[f].set(jnp.clip(
                    multp[f] * jnp.where(info.is_accepted, 1.01, 0.90),
                    1e-5, 1e4))
            parts = jax.tree.map(lambda a, s: a.at[f].set(s), parts, sub)
            infos.append(info)
        state = jax.tree.map(lambda a: a.reshape((C,) + a.shape[2:]),
                             parts)
        info = jax.tree.map(
            lambda *xs: jnp.stack(xs).reshape((C,) + xs[0].shape[1:]),
            *infos)
        if backoff:
            return (state, adapt, multp.reshape(C)), info
        return (state, adapt), info

    return one


def sample_ghmc(potential_fn: Callable, state: GHMCState,
                adapt: _FoldAdapt, key, num_samples: int,
                config: GHMCConfig = GHMCConfig(),
                collect_fn: Optional[Callable] = None,
                step_mult=None):
    """Continue sampling from an existing (state, adapt) — the
    checkpoint/resume entry point (utils/checkpoint.ResumableGHMC).
    `step_mult`: frozen per-chain ε multiplier from the warmup backoff
    (see _make_sweep).  Returns (samples, state, adapt, infos)."""
    C, D = state.z.shape
    kern = ghmc_kernel(potential_fn, config.divergence_threshold)
    one = _make_sweep(kern, config, C, D, mult_const=step_mult)
    if collect_fn is None:
        collect_fn = lambda z: z  # noqa: E731

    def sample_step(carry, key):
        keys = jax.random.split(key, config.thin)
        carry, infos = jax.lax.scan(one, carry, keys)
        info = jax.tree.map(lambda x: x[-1], infos)
        out = (jax.vmap(collect_fn)(carry[0].z), info.accept_prob,
               info.is_divergent, info.step_size)
        return carry, out

    (state, adapt), (samples, accept, div, step_sizes) = jax.lax.scan(
        sample_step, (state, adapt),
        jax.random.split(key, num_samples))
    return samples, state, adapt, {"accept_prob": accept,
                                   "divergences": div,
                                   "step_size": step_sizes}


def run_ghmc(potential_fn: Callable,
             init_positions: jnp.ndarray,   # (C, D)
             key,
             config: GHMCConfig = GHMCConfig(),
             inv_mass_diag: Optional[jnp.ndarray] = None,
             collect_fn: Optional[Callable] = None):
    """Warmup + sampling in one jitted program, like run_hmc/run_chees.

    `inv_mass_diag` (e.g. VIP's q*-variances) seeds the ensemble-
    variance preconditioner; the fold statistics take over from there.
    Returns (samples, stats): samples (S, C, D) or collect_fn's pytree
    with leading (S, C); one gradient per step, so
    stats["num_grad_evals_per_sample"] = config.thin.
    """
    C, D = init_positions.shape
    F = config.num_folds
    if C % F or C // F < 2:
        raise ValueError(
            f"num chains {C} must be a multiple of num_folds {F} with "
            f"at least 2 chains per fold")
    N = C // F
    dtype = init_positions.dtype

    kern = ghmc_kernel(potential_fn, config.divergence_threshold)
    pg = jax.vmap(jax.value_and_grad(potential_fn))
    pot0, grad0 = pg(init_positions)
    key, k_mom = jax.random.split(key)
    state0 = GHMCState(z=init_positions,
                       r=jax.random.normal(k_mom, (C, D), dtype),
                       pot=pot0, grad=grad0)

    if inv_mass_diag is None:
        var0 = jnp.ones((F, D), dtype)
    else:
        var0 = jnp.broadcast_to(
            jnp.asarray(inv_mass_diag, dtype).reshape(-1, D)[:1],
            (F, D))
    adapt0 = _FoldAdapt(v_g=jnp.ones((F, D), dtype) / jnp.sqrt(D),
                        v_z=jnp.ones((F, D), dtype) / jnp.sqrt(D),
                        lam_g=jnp.ones((F,), dtype),
                        lam_z=jnp.ones((F,), dtype),
                        var=var0)

    one_warm = _make_sweep(kern, config, C, D, backoff=True)

    n_w = config.num_warmup
    key, k_warm, k_samp = jax.random.split(key, 3)
    carry = (state0, adapt0)
    if n_w > 0:
        wcarry = (state0, adapt0, jnp.ones((C,), dtype))
        wcarry, warm_info = jax.lax.scan(one_warm, wcarry,
                                         jax.random.split(k_warm, n_w))
        state_w, adapt_w0, mult_w = wcarry
        warm_accept = warm_info.accept_prob
        # warmup -> sampling boundary: teleport chains the backoff could
        # not save (still near-zero acceptance) onto healthy donors —
        # the same one-time rescue run_hmc applies (hmc.py).  The
        # backoff multiplier is FROZEN into the sampling kernel rather
        # than dropped: the MEADS ε heuristic alone can sit ~100x below
        # the usable step (election88-NCP froze outright without it —
        # _make_sweep docstring); a constant per-chain multiplier keeps
        # the kernel exact.  Rescued chains inherit the healthy median
        # (their own mult backed off chasing a hopeless basin).
        state_w, stuck = H.rescue_stuck_chains(
            state_w, warm_accept, jax.random.fold_in(key, 7))
        # Freeze is GATED on the warmup's own evidence: only when the
        # ensemble median multiplier shows the raw MEADS ε to be
        # grossly (>4x) conservative does the frozen, >=1-clamped
        # multiplier carry into sampling.  Measured on both sides of
        # the gate: freezing eight_schools' ~1.7x equilibrium mult
        # cost 20x ess/grad (every extra rejection flips the
        # persistent momentum), while election88-NCP's raw ε is in a
        # self-locking regime (far ensemble -> inflated λ̂_g -> ε
        # ~2e-4 -> chains frozen at ess_min = C/2, R-hat 100-700;
        # probe_ghmc_election.json) that only the warmup-calibrated
        # multiplier escapes.  A constant multiplier keeps the
        # sampling kernel exact either way.
        mult_w = jnp.clip(mult_w, 1.0, 1e4)
        med = jnp.nan_to_num(
            jnp.nanmedian(jnp.where(stuck, jnp.nan, mult_w)), nan=1.0)
        mult_w = jnp.where(stuck, med, mult_w)
        mult_w = jnp.where(med > 4.0, mult_w, jnp.ones_like(mult_w))
        carry = (state_w, adapt_w0)
    else:
        warm_accept = jnp.zeros((0, C), dtype)
        stuck = jnp.zeros((C,), bool)
        mult_w = jnp.ones((C,), dtype)

    state_w, adapt_w = carry
    samples, state_final, adapt_final, sinfo = sample_ghmc(
        potential_fn, state_w, adapt_w, k_samp, config.num_samples,
        config, collect_fn=collect_fn, step_mult=mult_w)

    S = config.num_samples
    stats = {
        "step_size": (sinfo["step_size"][-1] if S > 0
                      else jnp.zeros((C,), dtype)),
        "inv_mass_diag": jnp.broadcast_to(
            adapt_final.var[:, None, :], (F, N, D)).reshape(C, D),
        "warmup_accept_prob": warm_accept,              # (W, C)
        "accept_prob": sinfo["accept_prob"],            # (S, C)
        "divergences": sinfo["divergences"],            # (S, C)
        "final_state": state_final,
        "final_adapt": adapt_final,
        "damping": adapt_final.lam_z,                   # (F,) diagnostics
        "step_mult": mult_w,                            # (C,) frozen ε mult
        "rescued_chains": stuck,                        # (C,) bool
        "num_grad_evals_per_sample": config.thin,
    }
    return samples, stats
