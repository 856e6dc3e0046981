"""Hamiltonian Monte Carlo, TPU-native.

Replaces the reference's `tfp.mcmc.HamiltonianMonteCarlo` +
`sample_chain` + TF1 step-size adaptation stack (SURVEY.md §3.1 "HMC
runner", §4.1).  Structural differences, by design:

- The whole run (warmup + sampling) is ONE jitted program: `lax.scan`
  over steps, `vmap` over chains.  The reference's per-run
  `session.run` host boundary (SURVEY.md §4 ★) does not exist here.
- Chains are a dense (C, D) f32 array — the TPU-friendly layout; all
  kernel math is elementwise over it (VPU) and the model's log-joint
  gradient is whatever XLA fuses it into.
- Adaptation is per-chain dual averaging (Hoffman & Gelman 2011
  constants: γ=0.05, t0=10, κ=0.75; arXiv:1111.4246 §3.2.1) plus
  Stan-style expanding-window diagonal mass (Welford) during warmup.
- Per-variable scaling from a VI phase (the reference's "step sizes from
  q* stddevs", SURVEY.md §4.2) enters as the diagonal inverse mass.

Written for single-chain state; batching is pure `jax.vmap`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HMCConfig", "run_hmc", "hmc_kernel", "warmup_schedule",
           "warmup_hmc", "sample_hmc"]


class DAState(NamedTuple):
    """Dual-averaging state (Hoffman–Gelman / NUTS paper §3.2.1)."""

    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    t: jnp.ndarray
    mu: jnp.ndarray


def da_init(step_size):
    log_eps = jnp.log(step_size)
    return DAState(log_eps=log_eps,
                   log_eps_bar=jnp.zeros_like(log_eps),
                   h_bar=jnp.zeros_like(log_eps),
                   t=jnp.zeros_like(log_eps),
                   mu=jnp.log(10.0) + log_eps)


def da_update(state: DAState, accept_prob, target):
    gamma, t0, kappa = 0.05, 10.0, 0.75
    t = state.t + 1.0
    w = 1.0 / (t + t0)
    h_bar = (1.0 - w) * state.h_bar + w * (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_eps_bar = eta * log_eps + (1.0 - eta) * state.log_eps_bar
    return DAState(log_eps, log_eps_bar, h_bar, t, state.mu)


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray


def welford_init(dim, dtype=jnp.float32):
    return WelfordState(jnp.zeros((dim,), dtype), jnp.zeros((dim,), dtype),
                        jnp.zeros((), dtype))


def welford_update(state: WelfordState, x):
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_variance(state: WelfordState):
    """Regularised variance estimate (Stan's shrinkage to unit)."""
    n = state.count
    var = state.m2 / jnp.maximum(n - 1.0, 1.0)
    w = n / (n + 5.0)
    return w * var + 1e-3 * (1.0 - w)


class DenseWelfordState(NamedTuple):
    """Pooled cross-chain dense covariance accumulator (one per batch,
    not per chain): Welford over the per-step ensemble means (captures
    between-step drift) plus the summed within-step ensemble scatter —
    the same law-of-total-variance decomposition the diagonal
    ``share_adaptation`` path uses, promoted to full (D, D) moments."""

    mean: jnp.ndarray    # (D,)
    m2: jnp.ndarray      # (D, D)
    count: jnp.ndarray   # ()


def dense_welford_init(dim, dtype=jnp.float32):
    return DenseWelfordState(jnp.zeros((dim,), dtype),
                             jnp.zeros((dim, dim), dtype),
                             jnp.zeros((), dtype))


def dense_welford_update(state: DenseWelfordState, z):
    """Accumulate one (C, D) ensemble snapshot."""
    zbar = jnp.mean(z, axis=0)
    count = state.count + 1.0
    delta = zbar - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + jnp.outer(delta, zbar - mean)
    # within-step ensemble scatter (averaged over chains), the parallel
    # term of the law-of-total-variance split
    zc = z - zbar[None, :]
    m2 = m2 + (zc.T @ zc) / z.shape[0]
    return DenseWelfordState(mean, m2, count)


def dense_welford_cov(state: DenseWelfordState, dtype=None):
    """Regularised covariance (Stan's shrinkage-to-identity, dense)."""
    n = state.count
    cov = state.m2 / jnp.maximum(n - 1.0, 1.0)
    w = n / (n + 5.0)
    eye = jnp.eye(state.mean.shape[0], dtype=state.mean.dtype)
    return w * cov + 1e-3 * (1.0 - w) * eye


def dense_mass_ops(sigma, dense_mask=None):
    """(Σ, R) pair for the dense kernel from a covariance estimate.

    Σ is the inverse mass (posterior covariance); momenta are drawn as
    r = R u with u ~ N(0, I), where R Rᵀ = Σ⁻¹ (R = L⁻ᵀ for Σ = LLᵀ).
    Falls back to the diagonal of Σ if the Cholesky fails (non-finite),
    so one bad window can never poison the run.

    `dense_mask` (float/bool (D,), optional) restricts the dense block:
    coordinates with mask 0 keep only their variance (diagonal metric),
    and every cross-covariance touching them is zeroed.  This is the
    funnel guard: support-transformed scale hypers have state-dependent
    (nonlinear) correlations with their children, and baking a *global*
    linear correction for them into the metric mis-scales the funnel
    neck and produces divergences (measured on election88: full-dense
    log(sigma_edu) ESS 1756 at 2.1% divergences vs healthy under
    block-dense).  The masked matrix is block-diagonal(PD, positive
    diag), hence PD.
    """
    if dense_mask is not None:
        m = jnp.asarray(dense_mask, sigma.dtype)
        keep = jnp.diagonal(sigma) * (1.0 - m)
        sigma = sigma * jnp.outer(m, m) + jnp.diag(keep)
    D = sigma.shape[-1]
    eye = jnp.eye(D, dtype=sigma.dtype)
    L = jnp.linalg.cholesky(sigma + 1e-6 * eye)
    r_fac = jax.scipy.linalg.solve_triangular(L, eye, lower=True).T
    ok = jnp.all(jnp.isfinite(r_fac))
    diag = jnp.clip(jnp.diagonal(sigma), 1e-6, None)
    sigma_d = eye * diag[None, :]
    r_diag = eye * jax.lax.rsqrt(diag)[None, :]
    return (jnp.where(ok, sigma, sigma_d), jnp.where(ok, r_fac, r_diag))


def adapt_step(da, wf, inv_mass, z, accept_prob, slow, end, *,
               target_accept, adapt_mass=True, share=False,
               pooled_stat="geom"):
    """One warmup adaptation update, shared by HMC/NUTS/iHMC warmups.

    Inputs are the batched adaptation states (DA over (C,), Welford over
    (C, D), inv_mass (C, D)), the post-transition positions z (C, D) and
    acceptance statistic (C,), plus the schedule bits for this step.
    `share` selects what is pooled across the chain batch:

    - False / "none": per-chain DA + per-chain Welford (Stan-style).
    - True / "all": one step size driven by the cross-chain mean
      acceptance AND a mass from the law-of-total-variance ensemble
      decomposition (see HMCConfig.share_adaptation).
    - "mass": pooled ensemble mass, per-chain step sizes.  For
      multi-basin posteriors (german_credit) where stuck chains drag
      any acceptance pool, but where the ensemble spread is still the
      only estimator that sees the flat wide directions (a per-chain
      Welford only ever sees its own local random walk).

    Returns (da, wf, inv_mass).
    """
    share_step = share is True or share == "all"
    share_mass = share_step or share == "mass"
    if share_step:
        # Pooled acceptance statistic across chains, broadcast back to
        # the (C,) DA state.  The choice matters (measured, 128 chains):
        # the arithmetic mean ignores slow subpopulations — chains out
        # in heavy tails (election88 NCP) accept rarely under the
        # mean-optimal step and never converge (ess/grad 2.4, R-hat
        # 1.24) — while the raw harmonic mean is dominated by ~zero-
        # acceptance stuck chains (multi-basin german_credit), which
        # collapse the shared step for everyone.  The floored GEOMETRIC
        # mean sits between: sensitive enough to slow chains to protect
        # election88, floored so a handful of true zeros cannot drag
        # the pool (german additionally defaults to "mass", which has
        # per-chain steps).  "arith"/"harm" remain selectable.
        a = jnp.maximum(accept_prob, 1e-3)
        if pooled_stat == "arith":
            pooled = jnp.mean(accept_prob)
        elif pooled_stat == "harm":
            pooled = 1.0 / jnp.mean(1.0 / a)
        else:
            pooled = jnp.exp(jnp.mean(jnp.log(a)))
        da = da_update(da, jnp.full_like(accept_prob, pooled),
                       target_accept)
    else:
        da = da_update(da, accept_prob, target_accept)
    if adapt_mass:
        if share_mass:
            # pool each draw's cross-chain moments into one Welford
            # stream shared by all chains: the ensemble is C times
            # more data per step than any single chain's history
            zbar = jnp.mean(z, axis=0)
            wf_new = jax.vmap(welford_update)(
                wf, jnp.broadcast_to(zbar, z.shape))
            # ensemble spread enters via a parallel variance term
            ens_var = jnp.var(z, axis=0)
            wf_new = wf_new._replace(m2=wf_new.m2 + ens_var[None, :])
        else:
            wf_new = jax.vmap(welford_update)(wf, z)
        wf = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(slow, (-1,) + (1,) * (a.ndim - 1)), b, a)
            if a.ndim > 0 else jnp.where(slow, b, a),
            wf, wf_new)
        var = jax.vmap(welford_variance)(wf)
        inv_mass = jnp.where(end, var, inv_mass)
        # window end: reset welford, restart dual averaging at the
        # current averaged step size
        wf = jax.tree.map(
            lambda a, zz: jnp.where(end, zz, a), wf,
            WelfordState(jnp.zeros_like(wf.mean),
                         jnp.zeros_like(wf.m2),
                         jnp.zeros_like(wf.count)))
        da_reset = da_init(jnp.exp(da.log_eps))
        da = jax.tree.map(lambda a, b: jnp.where(end, b, a), da,
                          da_reset)
    return da, wf, inv_mass


def rescue_stuck_chains(state_tree, warm_accept, key,
                        threshold: float = 0.05, tail: int = 100):
    """Teleport chains that finished warmup stuck to healthy donors.

    A fully pooled step size has no per-chain escape hatch: a chain that
    wandered into an extreme-curvature tail during warmup can sit at
    ~zero acceptance forever while the cross-chain mean (and hence the
    shared ε) looks perfect — observed on eight_schools NCP (one chain
    at 0.00 acceptance among 31 at 0.99 → R-hat 292).  At the END of
    warmup, any chain whose recent mean acceptance is < `threshold` is
    re-initialized at the position of a random healthy (top-half) chain.
    This is a pure re-initialization before the kept samples, so the
    sampling phase's invariance is untouched.

    `state_tree`: pytree with leading chain axis (e.g. HMCState or a
    bare (C, D) position array).  `warm_accept`: (W, C) warmup
    acceptance trace.  Returns (state_tree, stuck_mask).
    """
    W, C = warm_accept.shape
    if W == 0:
        return state_tree, jnp.zeros((C,), bool)
    t = min(tail, W)
    tail_acc = jnp.mean(warm_accept[-t:], axis=0)
    stuck = tail_acc < threshold
    order = jnp.argsort(-tail_acc)          # healthiest first
    ridx = jax.random.randint(key, (C,), 0, max(C // 2, 1))
    donor = order[ridx]

    def tp(a):
        if getattr(a, "ndim", 0) == 0:
            return a
        mask = stuck.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(mask, a[donor], a)

    return jax.tree.map(tp, state_tree), stuck


class HMCState(NamedTuple):
    z: jnp.ndarray          # (D,) unconstrained position
    pot: jnp.ndarray        # U(z)
    grad: jnp.ndarray       # ∇U(z)


class HMCInfo(NamedTuple):
    accept_prob: jnp.ndarray
    is_accepted: jnp.ndarray
    is_divergent: jnp.ndarray
    energy: jnp.ndarray
    step_size: jnp.ndarray


# Unroll factor for the leapfrog scan below.  The roofline analysis
# (PERF.md "Roofline / MFU") attributes the residual gap between
# achieved and floor HBM bandwidth to per-fusion dispatch latency
# across the ~dozen kernels of each leapfrog step; unrolling lets XLA
# fuse across step boundaries and amortize that fixed cost.  Measured
# on the real TPU (experiments/probe_unroll.py, 8192 chains x 500
# transitions): a wash on real models (radon-MN 1.00x — the gradient's
# kernels don't fuse across steps) but 1.20x at unroll=4 on a pure-
# elementwise potential (funnel D=128) whose whole step fuses.  Default
# 1 keeps the HLO — and the committed .jax_cache — unchanged; set 4
# for single-fusion potentials.
LEAPFROG_UNROLL = 1


def leapfrog(potential_and_grad: Callable, z, r, grad, step_size,
             inv_mass, num_steps: int):
    """L kick-drift-kick steps; returns (z, r, pot, grad).

    One potential-gradient evaluation per step (adjacent half-kicks are
    merged by construction of the scan body).
    """

    def body(carry, _):
        z, r, grad = carry
        r_half = r - 0.5 * step_size * grad
        z_new = z + step_size * inv_mass * r_half
        pot_new, grad_new = potential_and_grad(z_new)
        r_new = r_half - 0.5 * step_size * grad_new
        return (z_new, r_new, grad_new), pot_new

    (z, r, grad), pots = jax.lax.scan(body, (z, r, grad), None,
                                      length=num_steps,
                                      unroll=min(LEAPFROG_UNROLL,
                                                 num_steps))
    return z, r, pots[-1], grad


def leapfrog_dense(potential_and_grad: Callable, z, r, grad, step_size,
                   sigma, num_steps: int):
    """Leapfrog with a dense inverse mass Σ: drift is ε·Σ·r."""

    def body(carry, _):
        z, r, grad = carry
        r_half = r - 0.5 * step_size * grad
        z_new = z + step_size * (sigma @ r_half)
        pot_new, grad_new = potential_and_grad(z_new)
        r_new = r_half - 0.5 * step_size * grad_new
        return (z_new, r_new, grad_new), pot_new

    (z, r, grad), pots = jax.lax.scan(body, (z, r, grad), None,
                                      length=num_steps)
    return z, r, pots[-1], grad


def hmc_kernel_dense(potential_fn: Callable, num_leapfrog_steps: int,
                     divergence_threshold: float = 1000.0):
    """Dense-mass HMC transition for a single chain.

    `mass_ops` is the `(Σ, R)` pair from `dense_mass_ops`, SHARED across
    the chain batch (vmap with in_axes=(0, 0, 0, None)): Σ is the
    inverse mass (a posterior-covariance estimate, Stan's dense
    metric), momenta are r = R·u with u ~ N(0, I) so Cov(r) = Σ⁻¹, and
    kinetic energy is ½·rᵀΣr.  This is what removes the inter-block
    correlation cost the diagonal metric cannot see (the election88
    cVIP diagnosis: centered states correlate with their regression
    parents and mix ~2x slower under diagonal mass —
    results/election_probe/lamreg.json).
    """

    def potential_and_grad(z):
        return jax.value_and_grad(potential_fn)(z)

    def one_step(state: HMCState, key, step_size, mass_ops):
        sigma, r_fac = mass_ops
        key_mom, key_acc = jax.random.split(key)
        u = jax.random.normal(key_mom, state.z.shape, state.z.dtype)
        r = r_fac @ u
        energy0 = state.pot + 0.5 * jnp.dot(r, sigma @ r)
        z_new, r_new, pot_new, grad_new = leapfrog_dense(
            potential_and_grad, state.z, r, state.grad, step_size,
            sigma, num_leapfrog_steps)
        energy1 = pot_new + 0.5 * jnp.dot(r_new, sigma @ r_new)
        delta = energy0 - energy1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0)))
        is_divergent = -delta > divergence_threshold
        accept = jax.random.uniform(key_acc, (), state.z.dtype) < accept_prob
        new_state = HMCState(
            z=jnp.where(accept, z_new, state.z),
            pot=jnp.where(accept, pot_new, state.pot),
            grad=jnp.where(accept, grad_new, state.grad),
        )
        info = HMCInfo(accept_prob=accept_prob,
                       is_accepted=accept,
                       is_divergent=is_divergent,
                       energy=jnp.where(accept, energy1, energy0),
                       step_size=step_size)
        return new_state, info

    return one_step


def hmc_kernel(potential_fn: Callable, num_leapfrog_steps: int,
               divergence_threshold: float = 1000.0):
    """Build `one_step(state, key, step_size, inv_mass) -> (state, info)`
    for a single chain.  vmap it over (state, key, step_size, inv_mass)
    for the chain batch."""

    def potential_and_grad(z):
        return jax.value_and_grad(potential_fn)(z)

    def one_step(state: HMCState, key, step_size, inv_mass):
        key_mom, key_acc = jax.random.split(key)
        # r ~ N(0, M) with M = 1/inv_mass (diagonal)
        r = (jax.random.normal(key_mom, state.z.shape, state.z.dtype)
             * jax.lax.rsqrt(inv_mass))
        energy0 = state.pot + 0.5 * jnp.sum(r * r * inv_mass)
        z_new, r_new, pot_new, grad_new = leapfrog(
            potential_and_grad, state.z, r, state.grad, step_size,
            inv_mass, num_leapfrog_steps)
        energy1 = pot_new + 0.5 * jnp.sum(r_new * r_new * inv_mass)
        delta = energy0 - energy1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0)))
        is_divergent = -delta > divergence_threshold
        u = jax.random.uniform(key_acc, (), state.z.dtype)
        accept = u < accept_prob
        new_state = HMCState(
            z=jnp.where(accept, z_new, state.z),
            pot=jnp.where(accept, pot_new, state.pot),
            grad=jnp.where(accept, grad_new, state.grad),
        )
        # energy of the state the chain is actually AT after the
        # transition (Stan's `energy__`): the proposal's Hamiltonian if
        # accepted, else the refreshed-momentum Hamiltonian at the old
        # position.  This is the series E-BFMI is defined over.
        info = HMCInfo(accept_prob=accept_prob,
                       is_accepted=accept,
                       is_divergent=is_divergent,
                       energy=jnp.where(accept, energy1, energy0),
                       step_size=step_size)
        return new_state, info

    return one_step


def warmup_schedule(num_warmup: int, init_buffer: int = 75,
                    term_buffer: int = 50, base_window: int = 25):
    """Stan's three-phase warmup schedule as static numpy masks.

    Returns (is_slow, is_window_end) boolean arrays of length num_warmup.
    Fast phases adapt only the step size; slow windows additionally
    accumulate the diagonal mass, applied at each window end.
    """
    if num_warmup <= 0:
        return (np.zeros((0,), bool), np.zeros((0,), bool))
    if init_buffer + term_buffer + base_window > num_warmup:
        # Too short for the full scheme: single slow window in the middle
        init_buffer = max(1, int(0.15 * num_warmup))
        term_buffer = max(1, int(0.1 * num_warmup))
        base_window = num_warmup - init_buffer - term_buffer
        if base_window <= 0:
            return (np.zeros((num_warmup,), bool),
                    np.zeros((num_warmup,), bool))
    is_slow = np.zeros((num_warmup,), bool)
    is_end = np.zeros((num_warmup,), bool)
    pos = init_buffer
    window = base_window
    slow_total = num_warmup - init_buffer - term_buffer
    end_slow = init_buffer + slow_total
    while pos < end_slow:
        w = min(window, end_slow - pos)
        # if the remainder after this window is smaller than the next
        # window would be, absorb it (Stan's behaviour)
        if end_slow - (pos + w) < 2 * w and end_slow - (pos + w) > 0:
            w = end_slow - pos
        is_slow[pos:pos + w] = True
        is_end[pos + w - 1] = True
        pos += w
        window *= 2
    return is_slow, is_end


def warmup_hmc(potential_fn: Callable, init_positions, key,
               config: "HMCConfig", inv_mass_diag=None):
    """Adaptation phase only: returns (state, step_size (C,), inv_mass
    (C, D)) ready for sample_hmc.  Used by the orbax-resumable runner
    (utils/checkpoint.py) so a preempted run never redoes warmup."""
    cfg = config._replace(num_samples=1)
    samples, stats = run_hmc(potential_fn, init_positions, key, cfg,
                             inv_mass_diag=inv_mass_diag)
    return (stats["final_state"], stats["step_size"],
            stats["inv_mass_diag"])


def sample_hmc(potential_fn: Callable, state: "HMCState", key,
               num_samples: int, num_leapfrog_steps: int, step_size,
               inv_mass, collect_fn: Optional[Callable] = None):
    """Post-adaptation sampling from an explicit state (resume point).

    Returns (samples, final_state, accept_probs).  Chains continue a
    run checkpointed by utils/checkpoint.py exactly where it stopped
    (step size and mass frozen, as in the main sampling phase).
    """
    C = state.z.shape[0]
    kernel = jax.vmap(hmc_kernel(potential_fn, num_leapfrog_steps),
                      in_axes=(0, 0, 0, 0))
    if collect_fn is None:
        collect_fn = lambda z: z  # noqa: E731

    def step(st, k):
        keys = jax.random.split(k, C)
        st, info = kernel(st, keys, step_size, inv_mass)
        return st, (jax.vmap(collect_fn)(st.z), info.accept_prob)

    state, (samples, accept) = jax.lax.scan(
        step, state, jax.random.split(key, num_samples))
    return samples, state, accept


class HMCConfig(NamedTuple):
    num_warmup: int = 1000
    num_samples: int = 1000
    num_leapfrog_steps: int = 16
    target_accept: float = 0.75
    init_step_size: float = 0.1
    adapt_mass: bool = True
    divergence_threshold: float = 1000.0
    thin: int = 1
    #: pool adaptation statistics across the chain batch — with
    #: thousands of chains the ensemble is both statistically stronger
    #: and cheaper than per-chain adaptation; under sharding the pooling
    #: means become ICI collectives.  True/"all": one step size from the
    #: cross-chain mean acceptance + ensemble mass.  "mass": ensemble
    #: mass only, per-chain step sizes (for multi-basin posteriors where
    #: stuck chains drag the acceptance pool).  False/"none": per-chain
    #: (Stan-style).
    share_adaptation: object = False
    #: multiplicative step-size jitter (uniform in [1-j, 1+j]) applied
    #: per chain per transition when the step size is POOLED.  A single
    #: shared step with fixed L makes every chain share the same
    #: near-periodic trajectory, which can resonate with a near-Gaussian
    #: direction and collapse that dimension's ESS (measured: radon-MN
    #: NCP pooled 69.8 vs per-chain 978 ess/grad, worst dim b_floor —
    #: Neal 2011 §5.4's classic pathology and fix).  Per-chain step
    #: sizes carry natural spread, so jitter is unnecessary there.
    step_jitter: float = 0.2
    #: also jitter during warmup (noisier DA feedback); sampling-phase
    #: jitter alone already decoheres the frozen-step resonance
    step_jitter_warmup: bool = False
    #: cross-chain acceptance pool for the shared step ("geom"
    #: (floored), "arith", "harm") — see adapt_step
    pooled_accept_stat: str = "geom"
    #: "diag" (Stan-style diagonal metric, the default) or "dense" — a
    #: full (D, D) inverse-mass Σ estimated from the pooled cross-chain
    #: ensemble during the slow windows (law-of-total-variance split,
    #: like the diagonal ensemble path, but with full second moments).
    #: Dense removes the mixing cost of inter-block posterior
    #: correlations that no diagonal metric can see; with C chains
    #: contributing every step, even the base 25-step window gives
    #: thousands of ensemble draws for an O(100)-dim covariance.  The
    #: dense metric is inherently pooled (one Σ for the whole batch).
    mass_structure: str = "diag"


def run_hmc(potential_fn: Callable,
            init_positions: jnp.ndarray,   # (C, D)
            key,
            config: HMCConfig = HMCConfig(),
            inv_mass_diag: Optional[jnp.ndarray] = None,  # (D,) or (C, D)
            collect_fn: Optional[Callable] = None,
            kernel_impl: Optional[Callable] = None,
            dense_mask: Optional[jnp.ndarray] = None):     # (D,)
    """Run warmup + sampling for a batch of chains in one jitted program.

    Returns (samples, stats) where samples is (S, C, D) (or the pytree
    produced by `collect_fn(z)` with leading (S, C)) and stats is a dict
    of per-phase diagnostics.

    `inv_mass_diag` seeds the diagonal inverse mass — pass the variational
    posterior variances here for the VIP-HMC pipeline (reference: per-
    variable step sizes ∝ q stddevs, SURVEY.md §4.2).
    """
    C, D = init_positions.shape
    dtype = init_positions.dtype
    if config.mass_structure == "dense" and kernel_impl is None:
        return _run_hmc_dense(potential_fn, init_positions, key, config,
                              inv_mass_diag=inv_mass_diag,
                              collect_fn=collect_fn,
                              dense_mask=dense_mask)
    if kernel_impl is not None:
        # drop-in batched transition (e.g. ops.fused_hmc_kernel — the
        # Pallas VMEM-resident integrator); contract matches
        # vmap(hmc_kernel(...))
        v_kernel = kernel_impl
    else:
        kernel = hmc_kernel(potential_fn, config.num_leapfrog_steps,
                            config.divergence_threshold)
        v_kernel = jax.vmap(kernel, in_axes=(0, 0, 0, 0))
    pg = jax.vmap(jax.value_and_grad(potential_fn))

    if inv_mass_diag is None:
        inv_mass0 = jnp.ones((C, D), dtype)
    else:
        inv_mass0 = jnp.broadcast_to(jnp.asarray(inv_mass_diag, dtype),
                                     (C, D))

    pot0, grad0 = pg(init_positions)
    state0 = HMCState(init_positions, pot0, grad0)
    da0 = da_init(jnp.full((C,), config.init_step_size, dtype))
    wf0 = WelfordState(jnp.zeros((C, D), dtype), jnp.zeros((C, D), dtype),
                       jnp.zeros((C,), dtype))

    is_slow, is_end = warmup_schedule(config.num_warmup)
    is_slow = jnp.asarray(is_slow)
    is_end = jnp.asarray(is_end)

    share_step = (config.share_adaptation is True
                  or config.share_adaptation == "all")
    jitter = config.step_jitter if share_step else 0.0

    def _jittered(step_size, key):
        if jitter <= 0:
            return step_size
        u = jax.random.uniform(key, (C,), minval=1.0 - jitter,
                               maxval=1.0 + jitter)
        return step_size * u

    def warmup_step(carry, xs):
        state, da, wf, inv_mass = carry
        key, slow, end = xs
        key, kj = jax.random.split(key)
        keys = jax.random.split(key, C)
        step_size = jnp.exp(da.log_eps)
        if config.step_jitter_warmup:
            step_size = _jittered(step_size, kj)
        state, info = v_kernel(state, keys, step_size, inv_mass)
        da, wf, inv_mass = adapt_step(
            da, wf, inv_mass, state.z, info.accept_prob, slow, end,
            target_accept=config.target_accept,
            adapt_mass=config.adapt_mass,
            share=config.share_adaptation,
            pooled_stat=config.pooled_accept_stat)
        return (state, da, wf, inv_mass), info.accept_prob

    n_w = config.num_warmup
    key, k_warm, k_samp = jax.random.split(key, 3)
    if n_w > 0:
        warm_keys = jax.random.split(k_warm, n_w)
        (state0, da0, _, inv_mass0), warm_accept = jax.lax.scan(
            warmup_step, (state0, da0, wf0, inv_mass0),
            (warm_keys, is_slow, is_end))
        step_size_final = jnp.exp(da0.log_eps_bar)
    else:
        warm_accept = jnp.zeros((0, C), dtype)
        step_size_final = jnp.full((C,), config.init_step_size, dtype)

    stuck = jnp.zeros((C,), bool)
    if share_step and n_w > 0:
        state0, stuck = rescue_stuck_chains(
            state0, warm_accept, jax.random.fold_in(key, 7))

    if collect_fn is None:
        collect_fn = lambda z: z  # noqa: E731

    def sample_step(carry, key):
        state = carry
        def inner(state, key):
            key, kj = jax.random.split(key)
            keys = jax.random.split(key, C)
            state, info = v_kernel(state, keys,
                                   _jittered(step_size_final, kj),
                                   inv_mass0)
            return state, info
        if config.thin == 1:
            state, info = inner(state, key)
        else:
            def thin_body(s, k):
                s, info = inner(s, k)
                return s, info
            tkeys = jax.random.split(key, config.thin)
            state, infos = jax.lax.scan(thin_body, state, tkeys)
            info = jax.tree.map(lambda x: x[-1], infos)
        out = (jax.vmap(collect_fn)(state.z), info.accept_prob,
               info.is_divergent, info.energy)
        return state, out

    samp_keys = jax.random.split(k_samp, config.num_samples)
    state_final, (samples, accept_probs, divergences, energies) = \
        jax.lax.scan(sample_step, state0, samp_keys)

    stats = {
        "step_size": step_size_final,            # (C,)
        "inv_mass_diag": inv_mass0,              # (C, D)
        "warmup_accept_prob": warm_accept,       # (W, C)
        "accept_prob": accept_probs,             # (S, C)
        "divergences": divergences,              # (S, C)
        "energy": energies,                      # (S, C)
        "final_state": state_final,
        "rescued_chains": stuck,                 # (C,) bool
        "num_grad_evals_per_sample": config.num_leapfrog_steps
        * config.thin,
    }
    return samples, stats


def _run_hmc_dense(potential_fn: Callable,
                   init_positions: jnp.ndarray,   # (C, D)
                   key,
                   config: HMCConfig,
                   inv_mass_diag: Optional[jnp.ndarray] = None,
                   collect_fn: Optional[Callable] = None,
                   dense_mask: Optional[jnp.ndarray] = None):
    """run_hmc with a dense (D, D) inverse-mass metric (Stan's dense
    metric, estimated from the pooled cross-chain ensemble).

    Same contract as run_hmc; selected via
    ``HMCConfig(mass_structure="dense")``.  The metric state is ONE
    (Σ, R) pair shared by every chain (the ensemble estimator is
    inherently pooled); step-size adaptation follows
    ``share_adaptation`` exactly as in the diagonal path.  A diagonal
    ``inv_mass_diag`` seed (e.g. q*² variances) initialises Σ's
    diagonal.
    """
    C, D = init_positions.shape
    dtype = init_positions.dtype
    kernel = hmc_kernel_dense(potential_fn, config.num_leapfrog_steps,
                              config.divergence_threshold)
    v_kernel = jax.vmap(kernel, in_axes=(0, 0, 0, None))
    pg = jax.vmap(jax.value_and_grad(potential_fn))

    if inv_mass_diag is None:
        diag0 = jnp.ones((D,), dtype)
    else:
        d = jnp.asarray(inv_mass_diag, dtype)
        diag0 = jnp.mean(d, axis=0) if d.ndim > 1 else d
    eye = jnp.eye(D, dtype=dtype)
    sigma0 = eye * diag0[None, :]
    rfac0 = eye * jax.lax.rsqrt(jnp.clip(diag0, 1e-12, None))[None, :]

    pot0, grad0 = pg(init_positions)
    state0 = HMCState(init_positions, pot0, grad0)
    da0 = da_init(jnp.full((C,), config.init_step_size, dtype))
    dwf0 = dense_welford_init(D, dtype)

    is_slow, is_end = warmup_schedule(config.num_warmup)
    is_slow = jnp.asarray(is_slow)
    is_end = jnp.asarray(is_end)

    share_step = (config.share_adaptation is True
                  or config.share_adaptation == "all")
    jitter = config.step_jitter if share_step else 0.0

    def _jittered(step_size, key):
        if jitter <= 0:
            return step_size
        u = jax.random.uniform(key, (C,), minval=1.0 - jitter,
                               maxval=1.0 + jitter)
        return step_size * u

    def warmup_step(carry, xs):
        state, da, dwf, sigma, r_fac = carry
        key, slow, end = xs
        key, kj = jax.random.split(key)
        keys = jax.random.split(key, C)
        step_size = jnp.exp(da.log_eps)
        if config.step_jitter_warmup:
            step_size = _jittered(step_size, kj)
        state, info = v_kernel(state, keys, step_size, (sigma, r_fac))
        # step size: identical pooled/per-chain DA as the diagonal path
        da, _, _ = adapt_step(
            da, None, None, state.z, info.accept_prob, slow, end,
            target_accept=config.target_accept, adapt_mass=False,
            share=config.share_adaptation,
            pooled_stat=config.pooled_accept_stat)
        if config.adapt_mass:
            dwf_new = dense_welford_update(dwf, state.z)
            dwf = jax.tree.map(lambda a, b: jnp.where(slow, b, a),
                               dwf, dwf_new)
            sigma_new, rfac_new = dense_mass_ops(dense_welford_cov(dwf),
                                                 dense_mask=dense_mask)
            sigma = jnp.where(end, sigma_new, sigma)
            r_fac = jnp.where(end, rfac_new, r_fac)
            dwf = jax.tree.map(lambda a: jnp.where(end,
                                                   jnp.zeros_like(a), a),
                               dwf)
            da_reset = da_init(jnp.exp(da.log_eps))
            da = jax.tree.map(lambda a, b: jnp.where(end, b, a), da,
                              da_reset)
        return (state, da, dwf, sigma, r_fac), info.accept_prob

    n_w = config.num_warmup
    key, k_warm, k_samp = jax.random.split(key, 3)
    if n_w > 0:
        warm_keys = jax.random.split(k_warm, n_w)
        (state0, da0, _, sigma0, rfac0), warm_accept = jax.lax.scan(
            warmup_step, (state0, da0, dwf0, sigma0, rfac0),
            (warm_keys, is_slow, is_end))
        step_size_final = jnp.exp(da0.log_eps_bar)
    else:
        warm_accept = jnp.zeros((0, C), dtype)
        step_size_final = jnp.full((C,), config.init_step_size, dtype)

    stuck = jnp.zeros((C,), bool)
    if share_step and n_w > 0:
        state0, stuck = rescue_stuck_chains(
            state0, warm_accept, jax.random.fold_in(key, 7))

    if collect_fn is None:
        collect_fn = lambda z: z  # noqa: E731

    def sample_step(carry, key):
        state = carry
        def inner(state, key):
            key, kj = jax.random.split(key)
            keys = jax.random.split(key, C)
            state, info = v_kernel(state, keys,
                                   _jittered(step_size_final, kj),
                                   (sigma0, rfac0))
            return state, info
        if config.thin == 1:
            state, info = inner(state, key)
        else:
            tkeys = jax.random.split(key, config.thin)
            state, infos = jax.lax.scan(lambda s, k: inner(s, k),
                                        state, tkeys)
            info = jax.tree.map(lambda x: x[-1], infos)
        out = (jax.vmap(collect_fn)(state.z), info.accept_prob,
               info.is_divergent, info.energy)
        return state, out

    samp_keys = jax.random.split(k_samp, config.num_samples)
    state_final, (samples, accept_probs, divergences, energies) = \
        jax.lax.scan(sample_step, state0, samp_keys)

    stats = {
        "step_size": step_size_final,                      # (C,)
        # diagonal view for downstream consumers (checkpoint/readout);
        # the full metric is inv_mass_dense
        "inv_mass_diag": jnp.broadcast_to(jnp.diagonal(sigma0),
                                          (C, D)),
        "inv_mass_dense": sigma0,                          # (D, D)
        "warmup_accept_prob": warm_accept,                 # (W, C)
        "accept_prob": accept_probs,                       # (S, C)
        "divergences": divergences,                        # (S, C)
        "energy": energies,                                # (S, C)
        "final_state": state_final,
        "rescued_chains": stuck,                           # (C,) bool
        "num_grad_evals_per_sample": config.num_leapfrog_steps
        * config.thin,
    }
    return samples, stats
