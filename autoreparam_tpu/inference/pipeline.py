"""Experiment pipelines: the (method × inference) dispatch of the
reference's `main.py` (SURVEY.md §3.1 "Experiment driver", §4).

`run_experiment(spec, method=..., inference=...)` reproduces the
reference CLI vocabulary:

    method    ∈ {cp, ncp, cvip, dvip, interleaved}
    inference ∈ {hmc, nuts, chees, ghmc, vi}

The cVIP/dVIP pipelines are the reference's headline flow (SURVEY.md
§4.2): VI phase learns (q*, λ*), then HMC runs on the λ*-parameterised
model with chains initialised from q* and per-variable scaling from the
q* stddevs (as the diagonal inverse mass).
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.interpreters import get_model_info, make_potential_fn
from ..models.zoo import ModelSpec
from ..reparam import make_ncp_model, make_vip_model
from ..reparam.handler import eligible_sites, recover_fn
from . import diagnostics as dg
from . import hmc as H
from .interleaved import run_interleaved_hmc
from .vi import VIResult, discretize_lambda, fit_vi

__all__ = ["ExperimentResult", "run_experiment", "METHODS", "INFERENCES"]

METHODS = ("cp", "ncp", "cvip", "dvip", "interleaved")
INFERENCES = ("hmc", "nuts", "chees", "ghmc", "vi")

#: Models whose posteriors are multi-basin at warmup: stuck chains drag
#: any cross-chain acceptance pool, so these default to pooled *mass*
#: with per-chain step sizes (resolved when share_adaptation=None; the
#: ensemble spread is still the only estimator that sees their flat
#: sigma~10 log-scale directions).
MASS_ONLY_POOLING = frozenset({
    "german_credit_lognormalcentered",
    "german_credit_gammascale",
})


class ExperimentResult(NamedTuple):
    samples: Optional[jnp.ndarray]    # (S, C, D) unconstrained, or None (vi)
    stats: dict
    summary: dict                     # per-dim mean/std/ess/rhat (+ meta)
    vi: Optional[VIResult]
    lam: Optional[dict]               # learned λ (cvip/dvip)
    info: object                      # ModelInfo of the sampled model
    model: Callable                   # the (reparameterised) model sampled


def _vi_is_ess_frac(pot, vi_res, key, n=4096):
    """Relative importance-sampling ESS of q* against the true posterior
    (Yao et al. 2018 "Yes, but did it work?" — the cheap mean-field
    trust diagnostic).  Draw n samples from q*, weight by p/q, and
    return ESS(w)/n ∈ (0, 1]: near 1 when q* ≈ posterior, collapsing
    toward 1/n when mean-field missed the geometry.

    Measured values on the zoo (n=4096): eight_schools 0.24, radon-MN
    0.049, german lognormal 0.0031, german gammascale 0.00089.  Only
    the last — a handful of effective draws — marks a q* whose variance
    seed traps warmup (importance-*correcting* the seed was tried and
    is no better: from a collapsed proposal the weights never see the
    posterior tails, so the weighted variance stays collapsed)."""
    z = vi_res.sample(key, n)
    log_q = vi_res.log_q(z)
    log_w = -jax.vmap(pot)(z) - log_q
    log_w = jnp.where(jnp.isfinite(log_w), log_w, -jnp.inf)
    log_w = log_w - jnp.max(log_w)
    w = jnp.exp(log_w)
    frac = jnp.sum(w) ** 2 / (n * jnp.sum(w * w))
    return float(frac)


def _init_chains(key, num_chains, dim, scale=0.5, loc=None, q_scale=None):
    eps = jax.random.normal(key, (num_chains, dim))
    if loc is not None:
        return loc + q_scale * eps
    return scale * eps


def _scale_guard_mask(info):
    """Dense-block mask for the dense metric: 1 for unconstrained
    (Identity-support) coordinates, 0 for support-transformed ones
    (Exp-mapped scales, stick-breaking simplices, ...).

    Support-transformed sites are exactly the funnel-prone coordinates
    whose correlation with their children is state-dependent; a global
    linear metric entry for them is wrong in the tails and measurably
    destabilises the run (see hmc.dense_mass_ops).  They keep the
    adaptive diagonal; everything else (regression blocks, random
    effects) gets the full covariance treatment.
    """
    from ..dists import bijectors as bij
    parts = [np.full((s.size,),
                     1.0 if isinstance(s.bijector, bij.Identity) else 0.0,
                     np.float32)
             for s in info.latents]
    mask = np.concatenate(parts) if parts else np.zeros((0,), np.float32)
    # a mask with no dense coordinates degrades to the plain diagonal
    # metric; keep it — the caller records mass_structure honestly
    return jnp.asarray(mask)


def run_experiment(spec: ModelSpec,
                   method: str = "cp",
                   inference: str = "hmc",
                   *,
                   num_chains: int = 128,
                   num_warmup: int = 1000,
                   num_samples: int = 1000,
                   num_leapfrog_steps: int = 16,
                   num_optimization_steps: int = 3000,
                   num_mc_samples: int = 8,
                   learning_rate: float = 0.02,
                   target_accept: float = 0.75,
                   max_tree_depth: int = 8,
                   seed: int = 0,
                   collect_constrained: bool = True,
                   log_readout: bool = True,
                   shard: bool = False,
                   share_adaptation: Optional[bool] = None,
                   use_vi_init: bool = True,
                   use_vi_mass: bool = True,
                   vi_mass_min_is_ess: float = 0.002,
                   num_vi_restarts: int = 1,
                   vi_rank: int = 0,
                   vip_lam_tie: str = "element",
                   lam_reg: Optional[float] = None,
                   vip_pilot: Optional[bool] = None,
                   pilot_warmup: int = 800,
                   pilot_samples: int = 400,
                   dvip_refit: bool = True,
                   dvip_threshold: float = 0.5,
                   dvip_keep_band: float = 0.3,
                   tail_transport: bool = False,
                   chees_criterion: str = "chees_rate",
                   ghmc_thin: int = 1,
                   mass_structure: str = "diag"
                   ) -> ExperimentResult:
    """Run one (model × method × inference) experiment end to end.

    `share_adaptation=None` resolves per model: fully pooled
    cross-chain warmup everywhere (measured 6.6x min-ESS on radon cVIP,
    PERF.md) except the multi-basin german_credit posteriors, where
    chains stuck in bad basins have near-zero acceptance and drag any
    cross-chain acceptance pool — those default to pooled mass with
    per-chain step sizes ("mass"; see hmc.adapt_step).
    """
    if method not in METHODS:
        raise ValueError(f"method {method!r} not in {METHODS}")
    if inference not in INFERENCES:
        raise ValueError(f"inference {inference!r} not in {INFERENCES}")
    if method == "interleaved" and inference != "hmc":
        # iHMC is its own dual-kernel engine; silently running it under
        # an 'nuts'/'chees' label would mislabel the result JSONs
        raise ValueError(
            "method='interleaved' implements its own dual-HMC kernel; "
            "pass inference='hmc' (got {!r})".format(inference))

    key = jax.random.PRNGKey(seed)
    k_vi, k_init, k_run = jax.random.split(key, 3)
    model, args, kwargs = spec.model, spec.args, spec.kwargs

    if tail_transport:
        # Gaussian tail transport on heavy-tailed scale sites (σ ~
        # HalfCauchy): applied FIRST, so every method below (incl. the
        # VI phase and iHMC's dual systems) sees the transported model;
        # the remaining location-scale sites stay CP/NCP/VIP-eligible.
        from ..reparam import make_tail_transport_model
        model = make_tail_transport_model(model, model_args=args,
                                          model_kwargs=kwargs)

    # num_optimization_steps="auto" (or -1): plateau-gated VI budget
    # (vi.fit_vi_auto) instead of a hand-picked step count
    vi_auto = num_optimization_steps in ("auto", -1)

    def _fit(mdl, *, key, vip_sites=None, num_restarts=num_vi_restarts,
             lam_tie="element"):
        if vi_auto:
            from .vi import fit_vi_auto
            return fit_vi_auto(mdl, args, kwargs, vip_sites=vip_sites,
                               num_mc_samples=num_mc_samples,
                               learning_rate=learning_rate, key=key,
                               num_restarts=num_restarts,
                               lam_tie=lam_tie, q_rank=vi_rank,
                               lam_reg=lam_reg)
        return fit_vi(mdl, args, kwargs, vip_sites=vip_sites,
                      num_steps=num_optimization_steps,
                      num_mc_samples=num_mc_samples,
                      learning_rate=learning_rate, key=key,
                      num_restarts=num_restarts, lam_tie=lam_tie,
                      q_rank=vi_rank, lam_reg=lam_reg)

    vi_res = None
    lam = None
    pilot_choice = None
    grad_multiplier = 1.0

    # ---- build the sampled model per method --------------------------
    if method == "cp":
        sampled_model = model
    elif method == "ncp":
        sampled_model = make_ncp_model(model, model_args=args,
                                       model_kwargs=kwargs)
    elif method in ("cvip", "dvip"):
        sites = tuple(eligible_sites(model, args, kwargs))
        vi_res = _fit(model, key=k_vi, vip_sites=sites,
                      lam_tie=vip_lam_tie)
        lam = vi_res.lam
        if method == "dvip":
            lam = discretize_lambda(lam, threshold=dvip_threshold,
                                    keep_band=dvip_keep_band)
        # Pilot-selected parameterisation (the reference's sweep-and-
        # select driver philosophy — its main.py swept leapfrog steps
        # and kept the best, SURVEY.md §3.1 — applied to λ itself):
        # the mean-field ELBO is a *biased* criterion for sampler
        # geometry.  Measured on election88 (results/election_probe/):
        # per-element corr(λ, ESS) = -0.96 on the state block — the
        # ELBO centers data-rich states, but centered states correlate
        # with their regression parents and mix 2x slower under
        # diagonal mass, while λ-tilt penalties that fix one block
        # break another (lamreg.json).  No static criterion resolves
        # this; a short pilot run per candidate can, when pilot-length
        # behavior predicts full-length behavior.  Candidates race
        # at the same engine/budget-shape (λ is a traced argument, so
        # all pilots share ONE compiled program); the full run uses
        # the winner by min-dim ESS.  Pilot gradients are adaptation,
        # excluded from ess/grad like warmup (the reference's metric
        # convention).
        if vip_pilot is None:
            # Default OFF (measured, round 5): on election88 — the
            # model the pilot was built for — an 800-step pilot cannot
            # predict 5000-step warmup luck (the dominant variance
            # there), so switching λ mid-pipeline re-rolls the dice:
            # pilot-selected 5-seed ess/grad {8.2, 571, 293, 40, 7.3}
            # vs λ*-as-is {390, 339, 293, 274, 281}
            # (results/election_probe/lamreg.json, pilot_novimass vs
            # novimass).  The knob remains for cases where candidate
            # geometries differ by more than warmup noise (e.g. a
            # half-trained λ* on the funnel: the pilot correctly
            # picks ncp there).
            vip_pilot = False
        pilot_choice = None
        if vip_pilot and lam and inference == "hmc":
            if method == "dvip":
                candidates = {
                    "vi": lam,
                    "ncp": {s: jnp.zeros_like(v) for s, v in lam.items()},
                    "cp": {s: jnp.ones_like(v) for s, v in lam.items()},
                }
            else:
                candidates = {
                    "vi": lam,
                    "ncp": {s: jnp.zeros_like(v) for s, v in lam.items()},
                    "cp": {s: jnp.ones_like(v) for s, v in lam.items()},
                    "dvip_band": discretize_lambda(lam, keep_band=0.3),
                }
            pcfg = H.HMCConfig(
                num_warmup=min(pilot_warmup, num_warmup),
                num_samples=min(pilot_samples, num_samples),
                num_leapfrog_steps=num_leapfrog_steps,
                target_accept=target_accept,
                share_adaptation=(
                    "mass" if spec.name in MASS_ONLY_POOLING else True
                    ) if share_adaptation is None else share_adaptation)
            pinfo = get_model_info(make_vip_model(model, lam), args,
                                   kwargs)
            p_init = (vi_res.sample(k_init, num_chains) if use_vi_init
                      else _init_chains(k_init, num_chains, pinfo.dim))

            @jax.jit
            def _pilot(lam_a, init_a, key_a):
                pot_a = make_potential_fn(make_vip_model(model, lam_a),
                                          pinfo, args, kwargs)
                z, _ = H.run_hmc(pot_a, init_a, key_a, pcfg)
                ess = dg.effective_sample_size(z, max_lags=64)
                return jnp.min(ess)

            k_pilot = jax.random.fold_in(k_run, 99)
            scores = {}
            for name, cand in candidates.items():
                scores[name] = float(_pilot(cand, p_init, k_pilot))
            # ELBO's λ* wins ties (5% band): the pilot is a noisy
            # estimator and λ* is the principled default
            best_name = max(scores, key=scores.get)
            if scores[best_name] <= 1.05 * scores["vi"]:
                best_name = "vi"
            pilot_choice = {"choice": best_name,
                            "scores": {k: round(v, 1)
                                       for k, v in scores.items()}}
            lam = candidates[best_name]
        sampled_model = make_vip_model(model, lam)
        if (method == "cvip" and pilot_choice is not None
                and pilot_choice["choice"] != "vi"):
            # the pilot moved λ away from the fit's λ*: q* describes the
            # continuous-λ* aux coordinates, so re-fit q on the chosen
            # model before it seeds init/mass (same rationale as
            # dvip_refit below)
            refit = _fit(sampled_model,
                         key=jax.random.fold_in(k_vi, 2))
            vi_res = refit._replace(lam=lam)
        if method == "dvip" and dvip_refit:
            # Thresholding λ changes the model the HMC phase samples;
            # the cVIP q* describes the *continuous*-λ model's aux
            # coordinates, so feeding it to the thresholded model as
            # init/mass mis-scales exactly the sites whose λ moved
            # (measured: german_ln dVIP worst seed R-hat 1.30 with the
            # stale q*).  Re-fit q on the discretised model — λ is
            # fixed now, so this is plain ADVI.
            refit = _fit(sampled_model,
                         key=jax.random.fold_in(k_vi, 1))
            vi_res = refit._replace(lam=lam)
    elif method == "interleaved":
        sampled_model = model  # iHMC runs its own dual systems

    info = get_model_info(sampled_model, args, kwargs)

    # ---- VI-only inference -------------------------------------------
    if inference == "vi":
        if vi_res is None:
            vi_res = _fit(sampled_model, key=k_vi)
        summary = {
            "elbo": float(np.asarray(vi_res.elbo_trace)[-100:].mean()),
            "method": method, "inference": "vi", "model": spec.name,
            "vi_loc": np.asarray(vi_res.loc),
            "vi_scale": np.asarray(vi_res.scale),
            "latent_names": list(info.names),
            "num_optimization_steps": (
                int(vi_res.elbo_trace.shape[0]) if vi_auto
                else num_optimization_steps),
            "learning_rate": learning_rate,
            "num_vi_restarts": num_vi_restarts,
            "vip_lam_tie": vip_lam_tie,
            "lam_reg": lam_reg,
            "seed": seed,
        }
        if lam is not None:
            summary["lambda"] = {k: np.asarray(v)
                                 for k, v in lam.items()}
        return ExperimentResult(None, {}, summary, vi_res, lam, info,
                                sampled_model)

    # ---- MCMC --------------------------------------------------------
    if share_adaptation is None:
        share_adaptation = ("mass" if spec.name in MASS_ONLY_POOLING
                            else True)
    # The dense metric is implemented for the plain-HMC and NUTS
    # engines (local and sharded); other engines keep the diagonal
    # metric, recorded honestly below.
    eff_mass_structure = (
        mass_structure if (mass_structure == "dense"
                           and inference in ("hmc", "nuts")
                           and method != "interleaved") else "diag")
    cfg = H.HMCConfig(num_warmup=num_warmup, num_samples=num_samples,
                      num_leapfrog_steps=num_leapfrog_steps,
                      target_accept=target_accept,
                      share_adaptation=share_adaptation,
                      mass_structure=eff_mass_structure)

    inv_mass = None
    vi_is_ess = None
    if vi_res is not None and method in ("cvip", "dvip"):
        # chains start at q* draws; per-variable scaling from q* stddevs
        # (reference: init_state ~ q*, step sizes ∝ s*; SURVEY.md §4.2).
        # use_vi_init/use_vi_mass disable either leg (diagnostics knobs:
        # mean-field q* can under-disperse the start or under-estimate
        # flat directions' mass on some geometries).
        if use_vi_init:
            # full-q draws (covariance included when q_rank > 0)
            init = vi_res.sample(k_init, num_chains)
        else:
            init = _init_chains(k_init, num_chains, info.dim)
        if use_vi_mass:
            # Mean-field q* under-estimates marginal scales exactly on
            # the posteriors VIP cannot decorrelate (measured: german
            # gammascale q* scale 0.10 vs posterior sd 1.3 on the
            # log-precisions, posterior left correlated because the
            # only eligible site, beta ~ N(0,1), makes VIP an
            # identity).  Seeding the inverse mass with that collapsed
            # q*² traps the windowed ensemble estimator: chains start
            # in the collapsed q* ball, every window's variance ≈ the
            # collapsed seed, and 30k warmup steps never escape
            # (measured ess/grad 8.5 vs 91 under identity mass).  Gate
            # the seed on the q* trust diagnostic (one vmapped
            # potential eval; see _vi_is_ess_frac): a q* with only a
            # handful of effective draws forfeits its mass seed and
            # warmup starts from the identity.  The threshold sits
            # between german-lognormal (0.0031 — q*² still the best
            # seed, measured 8.6 vs 5.8 without) and german-gammascale
            # (0.00089 — identity wins, 90.4 vs 8.5).
            pot_d = make_potential_fn(sampled_model, info, args, kwargs)
            vi_is_ess = _vi_is_ess_frac(pot_d, vi_res,
                                        jax.random.fold_in(k_init, 1))
            if vi_is_ess >= vi_mass_min_is_ess:
                inv_mass = vi_res.marginal_scale() ** 2
    else:
        init = _init_chains(k_init, num_chains, info.dim)

    # Collect samples in *model space* by default (the user's variables,
    # with reparameterised sites mapped back through their deterministic
    # transforms) rather than raw unconstrained aux coordinates.
    collect = None
    if collect_constrained:
        collect = recover_fn(sampled_model, info, args, kwargs,
                             log_readout=log_readout)

    mesh = None
    if shard and inference != "vi":
        from ..parallel import make_mesh
        mesh = make_mesh()

    # Local (unsharded) engines run under ONE jax.jit with the learned
    # λ and the q*-derived init/mass as TRACED arguments: the compiled
    # HLO then depends only on the model's data constants and static
    # budgets, so the persistent compile cache (.jax_cache) hits
    # across processes even though every cVIP run learns a different
    # λ — an eagerly-run lax.scan is invisible to that cache and was
    # re-compiled every invocation (bench.py's cache rule, applied to
    # the library pipeline; CLAUDE.md).  The sharded runners already
    # jit; NUTS keeps its internal donate_argnums chunking (an outer
    # jit would drop donation and regrow its peak memory).
    vip_lam = lam if method in ("cvip", "dvip") else None
    dense_mask = None

    def _lam_pot_collect(lam_a):
        """(potential, collect) with λ traced (or the static model)."""
        m = (make_vip_model(model, lam_a) if lam_a is not None
             else sampled_model)
        p = make_potential_fn(m, info, args, kwargs)
        c = (recover_fn(m, info, args, kwargs, log_readout=log_readout)
             if collect_constrained else None)
        return p, c

    t0 = time.perf_counter()
    if method == "interleaved":
        if mesh is not None:
            from ..parallel import run_interleaved_sharded
            samples, stats = run_interleaved_sharded(
                model, init, k_run, cfg, mesh, model_args=args,
                model_kwargs=kwargs, collect_fn=collect)
        else:
            samples, stats = jax.jit(
                lambda init_a, key_a: run_interleaved_hmc(
                    model, init_a, key_a, cfg, model_args=args,
                    model_kwargs=kwargs, collect_fn=collect)
            )(init, k_run)
        grad_multiplier = 2.0
    elif inference == "nuts":
        pot = make_potential_fn(sampled_model, info, args, kwargs)
        nuts_kw = dict(num_warmup=num_warmup, num_samples=num_samples,
                       max_tree_depth=max_tree_depth,
                       target_accept=target_accept,
                       share_adaptation=share_adaptation,
                       inv_mass_diag=inv_mass, collect_fn=collect)
        if eff_mass_structure == "dense":
            dense_mask = _scale_guard_mask(info)
            nuts_kw.update(mass_structure="dense",
                           dense_mask=dense_mask)
        if mesh is not None:
            from ..parallel import run_nuts_sharded
            samples, stats = run_nuts_sharded(pot, init, k_run, mesh,
                                              **nuts_kw)
        else:
            from .nuts import run_nuts  # local import: heavy module
            samples, stats = run_nuts(pot, init, k_run, **nuts_kw)
    elif inference == "chees":
        from .chees import CheesConfig, run_chees
        ccfg = CheesConfig(num_warmup=num_warmup,
                           num_samples=num_samples,
                           criterion=chees_criterion)
        pot = make_potential_fn(sampled_model, info, args, kwargs)
        im1d = (inv_mass[0] if (inv_mass is not None
                                and inv_mass.ndim > 1) else inv_mass)
        if mesh is not None:
            from ..parallel import run_chees_sharded
            samples, stats = run_chees_sharded(
                pot, init, k_run, mesh, config=ccfg,
                inv_mass_diag=im1d, collect_fn=collect)
        else:
            def _chees_local(lam_a, init_a, key_a, im_a):
                p, c = _lam_pot_collect(lam_a)
                return run_chees(p, init_a, key_a, ccfg,
                                 inv_mass_diag=im_a, collect_fn=c)
            samples, stats = jax.jit(_chees_local)(vip_lam, init,
                                                   k_run, im1d)
    elif inference == "ghmc":
        from .ghmc import GHMCConfig, run_ghmc
        # thin > 1 keeps every thin-th sweep (1 gradient per sweep,
        # stats["num_grad_evals_per_sample"] = thin keeps the ess/grad
        # accounting exact): the memory-bounded way to gradient-match
        # GHMC to L-leapfrog engines at heavy budgets — materializing
        # L x num_samples kept draws OOMs the chip on the hard-geometry
        # models (measured: german_ln 160k draws x 128 chains).
        gcfg = GHMCConfig(num_warmup=num_warmup,
                          num_samples=num_samples,
                          thin=ghmc_thin)
        pot = make_potential_fn(sampled_model, info, args, kwargs)
        im1d = (inv_mass[0] if (inv_mass is not None
                                and inv_mass.ndim > 1) else inv_mass)
        if mesh is not None:
            from ..parallel import run_ghmc_sharded
            samples, stats = run_ghmc_sharded(
                pot, init, k_run, mesh, config=gcfg,
                inv_mass_diag=im1d, collect_fn=collect)
        else:
            def _ghmc_local(lam_a, init_a, key_a, im_a):
                p, c = _lam_pot_collect(lam_a)
                return run_ghmc(p, init_a, key_a, gcfg,
                                inv_mass_diag=im_a, collect_fn=c)
            samples, stats = jax.jit(_ghmc_local)(vip_lam, init,
                                                  k_run, im1d)
    else:
        pot = make_potential_fn(sampled_model, info, args, kwargs)
        if eff_mass_structure == "dense":
            dense_mask = _scale_guard_mask(info)
        if mesh is not None:
            from ..parallel import run_hmc_sharded
            samples, stats = run_hmc_sharded(pot, init, k_run, cfg, mesh,
                                             inv_mass_diag=inv_mass,
                                             collect_fn=collect,
                                             dense_mask=dense_mask)
        else:
            def _hmc_local(lam_a, init_a, key_a, im_a):
                p, c = _lam_pot_collect(lam_a)
                return H.run_hmc(p, init_a, key_a, cfg,
                                 inv_mass_diag=im_a, collect_fn=c,
                                 dense_mask=dense_mask)
            samples, stats = jax.jit(_hmc_local)(vip_lam, init,
                                                 k_run, inv_mass)
    jax.block_until_ready(samples)
    wall = time.perf_counter() - t0

    # Flatten dict-of-sites samples to one (S, C, Dtot) array + names.
    if isinstance(samples, dict):
        sample_array, names = flatten_site_samples(samples)
    else:
        sample_array = samples
        names = []
        for spec_l in info.latents:
            names.extend([spec_l.name] if spec_l.size == 1 else
                         [f"{spec_l.name}[{i}]"
                          for i in range(spec_l.size)])

    # fraction of finite draws per dim (f32 exp-overflow in model-space
    # recovery of nearly-unidentified scales can produce inf; surface it
    # rather than silently propagating NaN through the moments)
    finite_mask = jnp.isfinite(sample_array)
    finite_frac = jnp.mean(finite_mask.astype(jnp.float32), axis=(0, 1))
    summ = dg.summarize(sample_array)
    ess = summ["ess"]
    if method == "interleaved":
        # stats already counts both kernels (2L per outer sample)
        grads_per_sample = num_leapfrog_steps
    else:
        grads_per_sample = float(np.asarray(
            stats["num_grad_evals_per_sample"]))
    grads_per_sample = max(grads_per_sample, 1.0)
    epg = dg.ess_per_grad(ess, num_samples, grads_per_sample,
                          grad_multiplier=grad_multiplier)
    summary = {
        "model": spec.name, "method": method, "inference": inference,
        "mean": np.asarray(summ["mean"]),
        "std": np.asarray(summ["std"]),
        "ess": np.asarray(ess),
        "rhat": np.asarray(summ["rhat"]),
        "ess_min": float(np.asarray(ess).min()),
        "ess_mean": float(np.asarray(ess).mean()),
        "ess_per_grad_min": float(np.asarray(epg).min()),
        "ess_per_grad_mean": float(np.asarray(epg).mean()),
        "rhat_max": float(np.asarray(summ["rhat"]).max()),
        # nested R-hat, largest superchain count <= 64 dividing C: the
        # many-short-chains companion check (Margossian et al. 2024)
        "nested_rhat_max": (float(np.asarray(dg.nested_rhat(
            sample_array,
            max(k for k in range(1, min(64, num_chains) + 1)
                if num_chains % k == 0))).max())
            if num_chains >= 2 else None),
        "wall_time_s": wall,
        "ess_per_sec_min": float(np.asarray(ess).min() / wall),
        "num_chains": num_chains,
        "num_samples": num_samples,
        "num_warmup": num_warmup,
        "num_leapfrog_steps": num_leapfrog_steps,
        "seed": seed,
        "share_adaptation": str(share_adaptation),
        "mass_structure": eff_mass_structure,
        "dense_mask_frac": (float(np.asarray(dense_mask).mean())
                            if dense_mask is not None else None),
        "use_vi_init": bool(use_vi_init),
        "use_vi_mass": bool(use_vi_mass),
        "num_vi_restarts": num_vi_restarts,
        "vip_lam_tie": vip_lam_tie,
        "lam_reg": lam_reg,
        "vip_pilot": pilot_choice,
        "dvip_refit": bool(dvip_refit),
        "dvip_threshold": (dvip_threshold if method == "dvip" else None),
        "dvip_keep_band": (dvip_keep_band if method == "dvip" else None),
        "tail_transport": bool(tail_transport),
        "num_optimization_steps": (
            int(vi_res.elbo_trace.shape[0]) if vi_auto and vi_res is not None
            else num_optimization_steps),
        "learning_rate": learning_rate,
        "target_accept": target_accept,
        "max_tree_depth": (max_tree_depth if inference == "nuts"
                           else None),
        "chees_criterion": (chees_criterion if inference == "chees"
                            else None),
        "divergence_rate": (float(np.asarray(
            stats["divergences"]).mean())
            if "divergences" in stats else None),
        # E-BFMI (Stan's energy diagnostic; < 0.3 flags the heavy-tail /
        # funnel pathology reparameterisation exists to fix) — min over
        # chains, from the post-accept Hamiltonian series
        "ebfmi_min": (float(np.asarray(
            dg.ebfmi(stats["energy"])).min())
            if "energy" in stats and stats["energy"].shape[0] >= 2
            else None),
        "finite_fraction_min": float(np.asarray(finite_frac).min()),
        "param_names": names,
        "latent_names": list(info.names),
    }
    if lam is not None:
        summary["lambda"] = {k: np.asarray(v) for k, v in lam.items()}
    if vi_is_ess is not None:
        summary["vi_is_ess_frac"] = vi_is_ess
        summary["vi_rank"] = vi_rank
        summary["vi_mass_used"] = bool(inv_mass is not None)
        summary["vi_mass_min_is_ess"] = vi_mass_min_is_ess
    if vi_res is not None:
        # persist q* so the HMC phase is reproducible from artifacts
        # alone (reference: VI outputs reloaded by the HMC phase,
        # SURVEY.md §4.2/§6)
        summary["vi_loc"] = np.asarray(vi_res.loc)
        summary["vi_scale"] = np.asarray(vi_res.scale)
        summary["vi_elbo"] = float(np.asarray(
            vi_res.elbo_trace)[-100:].mean())
    return ExperimentResult(samples, stats, summary, vi_res, lam, info,
                            sampled_model)


def flatten_site_samples(samples: dict):
    """Flatten a dict of per-site (S, C, ...) sample arrays to one
    (S, C, Dtot) array plus per-column names (`theta[3]`-style)."""
    S_, C_ = next(iter(samples.values())).shape[:2]
    parts, names = [], []
    for name, v in samples.items():
        flatv = v.reshape(S_, C_, -1)
        parts.append(flatv)
        n = flatv.shape[-1]
        names.extend([name] if n == 1 else
                     [f"{name}[{i}]" for i in range(n)])
    return jnp.concatenate(parts, axis=-1), names


def result_summary(res: ExperimentResult, ci_prob: float = 0.9,
                   to_print: bool = False):
    """Per-variable posterior table for an ExperimentResult: mean, MCSE,
    sd, equal-tailed CI, bulk/tail ESS, rank-normalized R-hat (Vehtari
    et al. 2021), plus the paper's ess/1000-grad on the bulk ESS.

    Returns the list of rows (`diagnostics.summary_table`); with
    `to_print=True` also prints the aligned table.  Variables are the
    model-space coordinates the run collected (log-space scale names per
    `recover_fn`'s log_readout discipline).
    """
    from . import diagnostics as dg

    if res.samples is None:
        raise ValueError("result has no samples (VI-only run)")
    if isinstance(res.samples, dict):
        sample_array, names = flatten_site_samples(res.samples)
    else:
        sample_array = res.samples
        names = res.summary.get("param_names")
    num_grads = None
    gps = res.stats.get("num_grad_evals_per_sample")
    if gps is not None:
        import numpy as _np
        num_grads = (float(_np.asarray(gps))
                     * res.summary["num_samples"])
    elif res.summary.get("num_leapfrog_steps"):
        num_grads = (res.summary["num_samples"]
                     * res.summary["num_leapfrog_steps"])
    rows = dg.summary_table(sample_array, names=names,
                            ci_prob=ci_prob, num_grads=num_grads)
    if to_print:
        print(dg.format_summary(rows))
    return rows
