"""ChEES-HMC: cross-chain adaptive trajectory-length HMC.

Beyond-the-reference engine (the reference hand-tunes
--num_leapfrog_steps per model; SURVEY.md §3.1).  ChEES (Hoffman, Radul
& Sountsov, AISTATS 2021 — flagged in PAPERS.md via the ChEES-SMC
follow-up) adapts the trajectory length T by stochastic-gradient ascent
on the Change in the Estimator of the Expected Square criterion

    ChEES = 1/4 · E[(‖z′ − E z′‖² − ‖z − E z‖²)²],

whose gradient w.r.t. T is estimable from one step of a *large batch of
parallel chains* — exactly the TPU regime this framework runs in
(8k+ chains; the cross-chain means are one `jnp.mean`, which XLA turns
into ICI collectives when the chain axis is sharded).

Design notes:
- Trajectory lengths are jittered per iteration: t_i = u_i · T with
  u_i from a Halton sequence (shared across chains so every chain runs
  the same L_i leapfrog steps — the batch stays in lockstep; dynamic
  trip count via `lax.fori_loop` with a traced bound).
- Step size: dual averaging on the cross-chain mean acceptance
  (harmonic mean target 0.651, the jittered-HMC optimum used by TFP).
- Diagonal mass: exponential moving average of the *ensemble* variance
  across chains — with thousands of chains this replaces Stan's slow
  windowed Welford entirely (no warmup windows needed).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import hmc as H

__all__ = ["CheesConfig", "run_chees", "sample_chees"]


def _halton(n: int, base: int = 2) -> np.ndarray:
    """First n points of the base-b Halton sequence in (0, 1)."""
    out = np.zeros(n)
    for i in range(n):
        f, r, x = 1.0, 0.0, i + 1
        while x > 0:
            f /= base
            r += f * (x % base)
            x //= base
        out[i] = r
    return out


class CheesConfig(NamedTuple):
    num_warmup: int = 1000
    num_samples: int = 1000
    init_step_size: float = 0.1
    init_traj_length: float = 1.0
    target_accept: float = 0.651
    max_leapfrog_steps: int = 1024
    adam_lr: float = 0.025
    mass_ema: float = 0.9
    adapt_mass: bool = True
    divergence_threshold: float = 1000.0
    # "chees_rate" ascends the COST-NORMALIZED criterion
    # ChEES(T) / (n̄(T) + c0), n̄ = T/2ε the expected leapfrog count —
    # per-WALL-CLOCK efficiency (the normalization SNAPER-HMC
    # [Sountsov & Hoffman 2021] applies to its ESJD criterion, plus a
    # fixed per-proposal overhead c0).  Plain "chees" maximizes raw
    # ChEES, which keeps lengthening trajectories long after the
    # efficiency optimum: measured on the radon bench it drifts to
    # T~18.5 where min-ESS/s is ~2.5x worse than the T∈[3,10] plateau.
    # "snaper"/"snaper_rate" replace the ‖·‖² jump statistic with the
    # squared jump of the projection onto the leading principal
    # component of the (mass-preconditioned) posterior, estimated
    # online across the chain ensemble (SNAPER-HMC, arXiv:2110.11576):
    # the slowest direction is what min-ESS measures, so targeting it
    # directly beats the isotropic ChEES statistic when one direction
    # dominates.
    criterion: str = "chees_rate"
    # EMA damping for the streaming power iteration estimating the
    # leading principal component (snaper criteria only)
    pc_ema: float = 0.9
    # fixed cost per proposal in leapfrog-gradient equivalents: the
    # extra potential eval + momentum refresh + accept/state traffic
    # (+ per-sample collection in production loops).  Measured on the
    # radon bench loop the overhead is ~6 grad-equivalents; 4.0 is a
    # conservative engine-only default.  c0=0 reduces to pure
    # per-gradient normalization, which over-shortens (T→~2 while the
    # min-ESS/s plateau starts at ~3).
    cost_overhead: float = 4.0
    # average log T over the last `t_avg_frac` of warmup (the iterate-
    # averaging dual averaging already applies to log eps): the Adam
    # ascent is stochastic, and the LAST iterate is a lottery ticket.
    t_avg_frac: float = 0.4


class _AdamState(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray
    t: jnp.ndarray


def _make_transition(potential_fn: Callable, cfg: CheesConfig,
                     C: int, D: int, dtype):
    """Build the batched jittered-HMC transition shared by warmup,
    sampling, and the checkpoint-resume path (utils/checkpoint.py)."""
    v_pg = jax.vmap(jax.value_and_grad(potential_fn))

    def batched_leapfrog(z, r, grad, eps, inv_mass, n_steps):
        """n_steps (traced scalar) leapfrog steps for the whole batch."""

        def body(_, carry):
            z, r, grad = carry
            r_half = r - 0.5 * eps * grad
            z_new = z + eps * inv_mass[None, :] * r_half
            _, grad_new = v_pg(z_new)
            r_new = r_half - 0.5 * eps * grad_new
            return (z_new, r_new, grad_new)

        return jax.lax.fori_loop(0, n_steps, body, (z, r, grad))

    snaper = cfg.criterion.startswith("snaper")

    def transition(z, pot, grad, key, eps, inv_mass, u, pc=None):
        """One jittered-HMC step for all chains; returns the criterion
        gradient w.r.t. trajectory length as well.

        `pc` (D,), unit norm: leading principal-component estimate in
        the preconditioned space — used only by the snaper criteria
        (callers that discard the criterion outputs may omit it; XLA
        dead-code-eliminates the unused statistic)."""
        if pc is None:
            pc = jnp.ones((D,), dtype) * jax.lax.rsqrt(jnp.asarray(
                float(D), dtype))
        k_mom, k_acc = jax.random.split(key)
        traj = u  # = u_i * T, computed by caller
        n_steps = jnp.clip(
            jnp.ceil(traj / eps).astype(jnp.int32), 1,
            cfg.max_leapfrog_steps)
        r = (jax.random.normal(k_mom, (C, D), dtype)
             * jax.lax.rsqrt(inv_mass)[None, :])
        e0 = pot + 0.5 * jnp.sum(r * r * inv_mass[None, :], axis=-1)
        z1, r1, grad1 = batched_leapfrog(z, r, grad, eps, inv_mass,
                                         n_steps)
        pot1 = jax.vmap(potential_fn)(z1)
        e1 = pot1 + 0.5 * jnp.sum(r1 * r1 * inv_mass[None, :], axis=-1)
        delta = e0 - e1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0)))
        accept = (jax.random.uniform(k_acc, (C,), dtype) < accept_prob)

        # ChEES gradient w.r.t. trajectory length (paper eq. 14):
        # per-chain  α·(‖z′−z̄′‖² − ‖z−z̄‖²)·⟨z′−z̄′, v′⟩, v′ = M⁻¹ r′.
        # Divergent proposals (non-finite z′/r′) must be masked OUT of
        # the cross-chain means and sums: one bad chain in thousands
        # otherwise NaNs z̄′ and with it the whole estimator — at the
        # trajectory lengths where long-T feedback matters most, every
        # batch step has some divergent proposal, so without masking
        # the adaptation receives no signal exactly where it needs it.
        row_ok = (jnp.isfinite(pot1)
                  & jnp.all(jnp.isfinite(z1), axis=-1)
                  & jnp.all(jnp.isfinite(r1), axis=-1))
        okf = row_ok.astype(dtype)
        n_ok = jnp.maximum(jnp.sum(okf), 1.0)
        z1m = jnp.where(row_ok[:, None], z1, 0.0)
        zbar = jnp.mean(z, axis=0)     # cross-chain (ICI when sharded)
        zbar1 = jnp.sum(z1m, axis=0) / n_ok
        dz = z - zbar[None, :]
        dz1 = jnp.where(row_ok[:, None], z1 - zbar1[None, :], 0.0)
        w = accept_prob * okf          # accept_prob is 0 on bad rows
        denom = jnp.maximum(jnp.sum(w), 1e-6)
        if snaper:
            # jump statistic = squared projection onto the leading
            # principal component in the preconditioned space
            # ž = z/σ (σ² = inv_mass, the ensemble-variance mass):
            # C(T) = 1/4·E[(⟨ž′−ž̄′,p̂⟩² − ⟨ž−ž̄,p̂⟩²)²], whose
            # T-gradient per chain is sq·proj1·⟨p̂, ṽ′⟩ with
            # ṽ′ = dž′/dT = √(inv_mass)·r′.
            scale = jax.lax.rsqrt(inv_mass)[None, :]
            proj0 = jnp.sum(dz * scale * pc[None, :], axis=-1)
            proj1 = jnp.sum(dz1 * scale * pc[None, :], axis=-1)
            vs = jnp.where(row_ok[:, None],
                           r1 * jnp.sqrt(inv_mass)[None, :], 0.0)
            projv = jnp.sum(vs * pc[None, :], axis=-1)
            sq_diff = proj1 * proj1 - okf * proj0 * proj0
            chees_grad = jnp.sum(w * sq_diff * proj1 * projv) / denom
        else:
            sq_diff = jnp.sum(dz1 * dz1, axis=-1) - okf * jnp.sum(
                dz * dz, axis=-1)
            v1 = jnp.where(row_ok[:, None], r1 * inv_mass[None, :], 0.0)
            proj = jnp.sum(dz1 * v1, axis=-1)
            chees_grad = jnp.sum(w * sq_diff * proj) / denom
        # the criterion VALUE (same accept weighting as the gradient
        # estimator) — needed by the cost-normalized "*_rate"
        # ascent, d/dlogT [log C − log cost] = T·C′/C − dlogcost/dlogT
        chees_val = jnp.sum(w * sq_diff * sq_diff) / (4.0 * denom)

        acc2 = accept[:, None]
        z = jnp.where(acc2, z1, z)
        pot = jnp.where(accept, pot1, pot)
        grad = jnp.where(acc2, grad1, grad)
        divergent = -delta > cfg.divergence_threshold
        # post-accept Hamiltonian (Stan's energy__) — the E-BFMI series
        energy = jnp.where(accept, e1, e0)
        return (z, pot, grad, accept_prob, chees_grad, chees_val,
                n_steps, divergent, energy)

    return transition


def run_chees(potential_fn: Callable,
              init_positions,  # (C, D)
              key,
              config: CheesConfig = CheesConfig(),
              inv_mass_diag=None,
              collect_fn: Optional[Callable] = None):
    """Warmup (adapts ε, T, mass) + sampling, one jitted program.

    Returns (samples, stats); stats include the adapted trajectory
    length and realized leapfrog counts (for ESS/grad accounting).
    """
    C, D = init_positions.shape
    dtype = init_positions.dtype
    cfg = config
    if cfg.criterion not in ("chees", "chees_rate", "snaper",
                             "snaper_rate"):
        raise ValueError(
            f"unknown criterion {cfg.criterion!r}; expected one of "
            "chees, chees_rate, snaper, snaper_rate")
    v_pg = jax.vmap(jax.value_and_grad(potential_fn))

    halton = jnp.asarray(
        _halton(cfg.num_warmup + cfg.num_samples), dtype)

    if inv_mass_diag is None:
        inv_mass0 = jnp.ones((D,), dtype)
    else:
        inv_mass0 = jnp.asarray(inv_mass_diag, dtype)

    transition = _make_transition(potential_fn, cfg, C, D, dtype)

    def adam_update(a: _AdamState, g, lr):
        t = a.t + 1.0
        m = 0.9 * a.m + 0.1 * g
        v = 0.999 * a.v + 0.001 * g * g
        mhat = m / (1 - 0.9 ** t)
        vhat = v / (1 - 0.999 ** t)
        return _AdamState(m, v, t), lr * mhat / (jnp.sqrt(vhat) + 1e-8)

    pot0, grad0 = v_pg(init_positions)

    # tail averaging starts after this many warmup steps
    k_avg0 = int(cfg.num_warmup * (1.0 - cfg.t_avg_frac))

    snaper = cfg.criterion.startswith("snaper")

    def warm_step(carry, xs):
        (z, pot, grad, da, log_T, adam, inv_mass, c_ema, log_T_bar,
         n_avg, pc) = carry
        key, u, step_i = xs
        eps = jnp.exp(da.log_eps)
        traj = u * jnp.exp(log_T)
        (z, pot, grad, accept_prob, chees_grad, chees_val, n_steps,
         _, _) = transition(z, pot, grad, key, eps, inv_mass, traj, pc)
        # dual averaging on the cross-chain mean acceptance (arithmetic:
        # a harmonic mean is dominated by a few stuck chains and
        # collapses the shared step size; cf. hmc.adapt_step)
        mean_acc = jnp.mean(accept_prob)
        da = H.da_update(da, mean_acc, cfg.target_accept)
        # Adam ascent on log T with the raw ChEES gradient: Adam's
        # second moment is the running RMS normalizer, so magnitude
        # information survives (a sign-normalized gradient degrades
        # Adam to a fixed-step line search)
        g = chees_grad * jnp.exp(log_T)  # chain rule d/dlogT
        if cfg.criterion.endswith("_rate"):
            # d/dlogT [log C(T) − log(n̄+c0)] = T·C′/C − n̄/(n̄+c0),
            # with n̄ = T/2ε (expected jittered leapfrog count) and C
            # from a bias-corrected EMA (single-step values are too
            # noisy for a denominator)
            c_ema = 0.9 * c_ema + 0.1 * jnp.where(
                jnp.isfinite(chees_val), chees_val, c_ema)
            c_hat = c_ema / (1.0 - 0.9 ** (step_i + 1.0))
            nbar = jnp.exp(log_T) / (2.0 * eps)
            g = (g / jnp.maximum(c_hat, 1e-12)
                 - nbar / (nbar + cfg.cost_overhead))
        if snaper:
            # streaming power iteration for the leading principal
            # component of the preconditioned ensemble: EMA-damped
            # normalized covariance action  p̂ ← norm((1−β)·p̂ + β·Sp̂/‖Sp̂‖)
            # (the ensemble across thousands of chains makes S·p̂ a
            # single matvec pair; under GSPMD the chain contraction
            # lowers to a psum over ICI)
            zs = z * jax.lax.rsqrt(inv_mass)[None, :]
            dzs = zs - jnp.mean(zs, axis=0)[None, :]
            spc = dzs.T @ (dzs @ pc)
            spc_n = spc * jax.lax.rsqrt(
                jnp.sum(spc * spc) + jnp.asarray(1e-20, dtype))
            pc_new = (cfg.pc_ema * pc + (1.0 - cfg.pc_ema) * spc_n)
            pc_new = pc_new * jax.lax.rsqrt(
                jnp.sum(pc_new * pc_new) + jnp.asarray(1e-20, dtype))
            pc = jnp.where(jnp.all(jnp.isfinite(pc_new)), pc_new, pc)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        adam, step = adam_update(adam, -g, cfg.adam_lr)
        log_T_new = log_T - step
        # keep T finite and within [1, max_leapfrog] steps at current ε
        log_T_new = jnp.where(jnp.isfinite(log_T_new), log_T_new, log_T)
        log_T = jnp.clip(
            log_T_new,
            da.log_eps,
            jnp.log(float(cfg.max_leapfrog_steps)) + da.log_eps)
        # iterate-average log T over the warmup tail (mirrors dual
        # averaging's log_eps_bar): running mean of the post-update
        # iterate from step k_avg0 on
        in_tail = step_i >= k_avg0
        n_new = n_avg + jnp.where(in_tail, 1.0, 0.0)
        log_T_bar = jnp.where(
            in_tail,
            log_T_bar + (log_T - log_T_bar) / jnp.maximum(n_new, 1.0),
            log_T_bar)
        if cfg.adapt_mass:
            ens_var = jnp.var(z, axis=0) + 1e-6
            inv_mass = (cfg.mass_ema * inv_mass
                        + (1 - cfg.mass_ema) * ens_var)
        return ((z, pot, grad, da, log_T, adam, inv_mass, c_ema,
                 log_T_bar, n_new, pc),
                (accept_prob, jnp.exp(log_T), n_steps))

    key, k_warm, k_samp = jax.random.split(key, 3)
    da0 = H.da_init(jnp.asarray(cfg.init_step_size, dtype))
    log_T0 = jnp.log(jnp.asarray(cfg.init_traj_length, dtype))
    adam0 = _AdamState(jnp.zeros((), dtype), jnp.zeros((), dtype),
                       jnp.zeros((), dtype))

    pc0 = jnp.ones((D,), dtype) * jax.lax.rsqrt(
        jnp.asarray(float(D), dtype))
    carry = (init_positions, pot0, grad0, da0, log_T0, adam0, inv_mass0,
             jnp.zeros((), dtype), log_T0, jnp.zeros((), dtype), pc0)
    stuck = jnp.zeros((C,), bool)
    if cfg.num_warmup > 0:
        carry, (warm_acc, T_trace, L_trace) = jax.lax.scan(
            warm_step, carry,
            (jax.random.split(k_warm, cfg.num_warmup),
             halton[:cfg.num_warmup],
             jnp.arange(cfg.num_warmup, dtype=dtype)))
        (z, pot, grad, da, log_T, _, inv_mass, _, log_T_bar,
         n_avg, pc0) = carry
        # the shared (ε, T) have no per-chain escape hatch; teleport
        # chains that ended warmup stuck (see hmc.rescue_stuck_chains)
        (z, pot, grad), stuck = H.rescue_stuck_chains(
            (z, pot, grad), warm_acc, jax.random.fold_in(key, 7))
        log_T = jnp.where(n_avg > 0, log_T_bar, log_T)
    else:
        warm_acc = jnp.zeros((0, C), dtype)
        T_trace = L_trace = jnp.zeros((0,), dtype)
        z, pot, grad, da, log_T = carry[:5]
        inv_mass = carry[6]
    eps_final = jnp.exp(da.log_eps_bar)
    T_final = jnp.exp(log_T)

    samples, (z, pot, grad), (acc, n_steps, div, energy) = sample_chees(
        potential_fn, z, pot, grad, k_samp, cfg.num_samples,
        eps_final, T_final, inv_mass,
        halton_u=halton[cfg.num_warmup:], config=cfg,
        collect_fn=collect_fn)

    stats = {
        "step_size": eps_final,
        "trajectory_length": T_final,
        "inv_mass_diag": inv_mass,
        "accept_prob": acc,
        "num_leapfrog_per_sample": n_steps,      # (S,)
        "num_grad_evals_per_sample": jnp.mean(
            n_steps.astype(dtype)),
        "divergences": div,
        "energy": energy,                         # (S, C)
        "rescued_chains": stuck,
        "warmup_accept": warm_acc,                # (W, C)
        "warmup_T_trace": T_trace,
        "principal_component": pc0,               # (D,) unit, snaper
        "final_position": z,
        "final_pot": pot,
        "final_grad": grad,
    }
    return samples, stats


def sample_chees(potential_fn: Callable, z, pot, grad, key,
                 num_samples: int, step_size, traj_length, inv_mass,
                 *, halton_u=None, config: CheesConfig = CheesConfig(),
                 collect_fn: Optional[Callable] = None):
    """Post-adaptation ChEES sampling from an explicit state (resume
    point, mirroring hmc.sample_hmc).  `step_size`/`traj_length`
    (scalars) and `inv_mass` (D,) are traced args so a resume with
    different adapted values reuses the compiled program; `halton_u`
    supplies the trajectory-jitter sequence — a resume passes the slice
    of the run's Halton sequence starting at its global sample offset
    so the concatenated trajectory is identical to an uninterrupted run.

    Returns (samples, (z, pot, grad), (accept, n_steps, divergent,
    energy)).
    """
    C, D = z.shape
    dtype = z.dtype
    cfg = config
    transition = _make_transition(potential_fn, cfg, C, D, dtype)
    if halton_u is None:
        halton_u = jnp.asarray(_halton(num_samples), dtype)
    if collect_fn is None:
        collect_fn = lambda zz: zz  # noqa: E731

    def sample_step(carry, xs):
        z, pot, grad = carry
        k, u = xs
        traj = u * traj_length
        (z, pot, grad, accept_prob, _, _, n_steps, div, en) = transition(
            z, pot, grad, k, step_size, inv_mass, traj)
        return (z, pot, grad), (jax.vmap(collect_fn)(z), accept_prob,
                                n_steps, div, en)

    (z, pot, grad), (samples, acc, n_steps, div, energy) = jax.lax.scan(
        sample_step, (z, pot, grad),
        (jax.random.split(key, num_samples), halton_u))
    return samples, (z, pot, grad), (acc, n_steps, div, energy)
