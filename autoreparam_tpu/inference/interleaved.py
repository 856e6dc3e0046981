"""Interleaved HMC (iHMC): alternate CP and NCP coordinate systems.

Rebuild of the reference's `Interleaved` TFP TransitionKernel
(SURVEY.md §3.1 "Interleaved HMC", §4.3 [H]): ASIS-style (Yu & Meng
2011) alternation — each outer step takes one HMC step in CP
coordinates, deterministically maps the state to NCP coordinates, takes
one HMC step there, and maps back.  Both inner kernels adapt their own
step size (dual averaging) and diagonal mass during warmup.

The coordinate maps are *exact* deterministic bijections computed by
replaying the model trace at the current state (z = μ + σ·ẑ ⇔
ẑ = (z−μ)/σ, with μ,σ the current values of the site's parents;
log-space for LogNormal sites).  Because each map is a reparameterisation
of the same joint, no Jacobian enters the MH corrections of the inner
kernels — each kernel targets its own coordinate system's density,
which is the ASIS construction.

Gradient cost: 2× per outer sample; report ESS/grad with
`grad_multiplier=2` (SURVEY.md §4.3 note).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core import handlers
from ..core.interpreters import (ModelInfo, get_model_info,
                                 make_potential_fn)
from ..reparam import AUX_SUFFIX, make_ncp_model
from ..reparam.handler import eligible_sites
from . import hmc as H

__all__ = ["make_coordinate_maps", "run_interleaved_hmc"]


def make_coordinate_maps(model: Callable, ncp_model: Callable,
                         info_cp: ModelInfo, info_ncp: ModelInfo,
                         ncp_sites, model_args: tuple = (),
                         model_kwargs: Optional[dict] = None):
    """Build (cp_to_ncp, ncp_to_cp) maps between flat unconstrained
    vectors of the two coordinate systems."""
    model_kwargs = model_kwargs or {}
    ncp_set = set(ncp_sites)

    def site_base_loc_scale(dist):
        ls = dist.loc_scale()
        if ls is not None:
            return ls[0], ls[1], False
        loc, scale = dist.base_loc_scale()
        return loc, scale, True

    def cp_to_ncp(flat_cp):
        vals = info_cp.constrain(flat_cp)
        tr = handlers.trace(handlers.substitute(model, data=vals))
        sites = tr.get_trace(*model_args, **model_kwargs)
        out = {}
        for spec in info_ncp.latents:
            name = spec.name
            if (name.endswith(AUX_SUFFIX)
                    and name[:-len(AUX_SUFFIX)] in ncp_set):
                orig = name[:-len(AUX_SUFFIX)]
                dist = sites[orig].dist
                loc, scale, is_log = site_base_loc_scale(dist)
                z = vals[orig]
                zc = jnp.log(z) if is_log else z
                out[name] = (zc - loc) / scale
            else:
                out[name] = spec.bijector.inverse(vals[name])
        return info_ncp.ravel(out)

    def ncp_to_cp(flat_ncp):
        constrained = info_ncp.constrain(flat_ncp)
        tr = handlers.trace(
            handlers.substitute(ncp_model, data=constrained))
        sites = tr.get_trace(*model_args, **model_kwargs)
        out = {}
        for spec in info_cp.latents:
            # reparameterised sites are deterministic records in the NCP
            # trace; the rest are latents shared by both systems
            out[spec.name] = spec.bijector.inverse(sites[spec.name].value)
        return info_cp.ravel(out)

    return cp_to_ncp, ncp_to_cp


def run_interleaved_hmc(model: Callable,
                        init_positions,   # (C, D) in CP unconstrained
                        key,
                        config: H.HMCConfig = H.HMCConfig(),
                        ncp_sites=None,
                        model_args: tuple = (),
                        model_kwargs: Optional[dict] = None,
                        collect_fn: Optional[Callable] = None):
    """One jitted program: warmup (both kernels adapt) + sampling.

    Returns (samples_in_cp, stats).  BASELINE config #4
    (german_credit_lognormalcentered iHMC) runs through here.
    """
    model_kwargs = model_kwargs or {}
    if ncp_sites is None:
        ncp_sites = list(eligible_sites(model, model_args, model_kwargs))

    ncp_model = make_ncp_model(model, sites=ncp_sites,
                               model_args=model_args,
                               model_kwargs=model_kwargs)
    info_cp = get_model_info(model, model_args, model_kwargs)
    info_ncp = get_model_info(ncp_model, model_args, model_kwargs)
    assert info_cp.dim == info_ncp.dim, "coordinate systems must align"
    pot_cp = make_potential_fn(model, info_cp, model_args, model_kwargs)
    pot_ncp = make_potential_fn(ncp_model, info_ncp, model_args,
                                model_kwargs)
    to_ncp, to_cp = make_coordinate_maps(model, ncp_model, info_cp,
                                         info_ncp, ncp_sites,
                                         model_args, model_kwargs)

    C, D = init_positions.shape
    dtype = init_positions.dtype
    kern_cp = jax.vmap(H.hmc_kernel(pot_cp, config.num_leapfrog_steps,
                                    config.divergence_threshold),
                       in_axes=(0, 0, 0, 0))
    kern_ncp = jax.vmap(H.hmc_kernel(pot_ncp, config.num_leapfrog_steps,
                                     config.divergence_threshold),
                        in_axes=(0, 0, 0, 0))
    pg_cp = jax.vmap(jax.value_and_grad(pot_cp))
    pg_ncp = jax.vmap(jax.value_and_grad(pot_ncp))
    v_to_ncp = jax.vmap(to_ncp)
    v_to_cp = jax.vmap(to_cp)

    # Pooled-warmup mitigations, mirroring run_hmc (knob parity across
    # engines): a fully pooled step size gives every chain the same
    # near-periodic trajectory (resonance, Neal 2011 §5.4) and no
    # per-chain escape hatch for a chain stuck at ~zero acceptance —
    # both measured on HMC (hmc.HMCConfig.step_jitter docstring,
    # rescue_stuck_chains).  iHMC has TWO pooled kernels, so jitter
    # draws independent factors per kernel and the rescue treats a
    # chain as stuck if EITHER coordinate system's acceptance died
    # (one dead kernel blocks the alternation).
    share_step = (config.share_adaptation is True
                  or config.share_adaptation == "all")
    jitter = config.step_jitter if share_step else 0.0

    def _jittered(step_size, key):
        if jitter <= 0:
            return step_size
        u = jax.random.uniform(key, (C,), minval=1.0 - jitter,
                               maxval=1.0 + jitter)
        return step_size * u

    def outer_step(z_cp, key, ss_cp, ss_ncp, im_cp, im_ncp,
                   jitter_steps: bool):
        """One interleaved transition in CP coordinates."""
        k1, k2, kj1, kj2 = jax.random.split(key, 4)
        if jitter_steps:
            ss_cp = _jittered(ss_cp, kj1)
            ss_ncp = _jittered(ss_ncp, kj2)
        pot0, grad0 = pg_cp(z_cp)
        st = H.HMCState(z_cp, pot0, grad0)
        st, info_a = kern_cp(st, jax.random.split(k1, C), ss_cp, im_cp)
        z_ncp = v_to_ncp(st.z)
        pot1, grad1 = pg_ncp(z_ncp)
        st2 = H.HMCState(z_ncp, pot1, grad1)
        st2, info_b = kern_ncp(st2, jax.random.split(k2, C), ss_ncp,
                               im_ncp)
        z_back = v_to_cp(st2.z)
        return z_back, info_a, info_b

    # --- warmup: adapt both kernels -----------------------------------
    is_slow, is_end = H.warmup_schedule(config.num_warmup)
    is_slow, is_end = jnp.asarray(is_slow), jnp.asarray(is_end)

    da_cp0 = H.da_init(jnp.full((C,), config.init_step_size, dtype))
    da_ncp0 = H.da_init(jnp.full((C,), config.init_step_size, dtype))
    im_cp0 = jnp.ones((C, D), dtype)
    im_ncp0 = jnp.ones((C, D), dtype)
    wf0 = H.WelfordState(jnp.zeros((C, D), dtype),
                         jnp.zeros((C, D), dtype), jnp.zeros((C,), dtype))

    def warm_step(carry, xs):
        z, da_cp, da_ncp, wf_cp, wf_ncp, im_cp, im_ncp = carry
        key, slow, end = xs
        z, ia, ib = outer_step(z, key, jnp.exp(da_cp.log_eps),
                               jnp.exp(da_ncp.log_eps), im_cp, im_ncp,
                               config.step_jitter_warmup)
        # each inner kernel adapts in its own coordinate system, through
        # the shared machinery (incl. pooled/"mass" cross-chain modes)
        da_cp, wf_cp, im_cp = H.adapt_step(
            da_cp, wf_cp, im_cp, z, ia.accept_prob, slow, end,
            target_accept=config.target_accept,
            adapt_mass=config.adapt_mass,
            share=config.share_adaptation)
        da_ncp, wf_ncp, im_ncp = H.adapt_step(
            da_ncp, wf_ncp, im_ncp, v_to_ncp(z), ib.accept_prob, slow,
            end, target_accept=config.target_accept,
            adapt_mass=config.adapt_mass,
            share=config.share_adaptation)
        return ((z, da_cp, da_ncp, wf_cp, wf_ncp, im_cp, im_ncp),
                (ia.accept_prob, ib.accept_prob))

    key, kw, ks = jax.random.split(key, 3)
    z0 = init_positions
    if config.num_warmup > 0:
        ((z0, da_cp0, da_ncp0, _, _, im_cp0, im_ncp0),
         (warm_acc_cp, warm_acc_ncp)) = jax.lax.scan(
            warm_step,
            (z0, da_cp0, da_ncp0, wf0, wf0, im_cp0, im_ncp0),
            (jax.random.split(kw, config.num_warmup), is_slow, is_end))
        ss_cp = jnp.exp(da_cp0.log_eps_bar)
        ss_ncp = jnp.exp(da_ncp0.log_eps_bar)
    else:
        # mirror run_hmc's zero-warmup guard: log_eps_bar starts at 0, so
        # exp() would silently override config.init_step_size with 1.0
        warm_acc_cp = warm_acc_ncp = jnp.zeros((0, C), dtype)
        ss_cp = jnp.full((C,), config.init_step_size, dtype)
        ss_ncp = jnp.full((C,), config.init_step_size, dtype)

    stuck = jnp.zeros((C,), bool)
    if share_step and config.num_warmup > 0:
        # a chain is stuck if EITHER kernel's recent acceptance died —
        # the alternation makes no progress through a dead system
        z0, stuck = H.rescue_stuck_chains(
            z0, jnp.minimum(warm_acc_cp, warm_acc_ncp),
            jax.random.fold_in(key, 7))

    if collect_fn is None:
        collect_fn = lambda z: z  # noqa: E731

    def sample_step(z, key):
        z, ia, ib = outer_step(z, key, ss_cp, ss_ncp, im_cp0, im_ncp0,
                               True)
        return z, (jax.vmap(collect_fn)(z), ia.accept_prob,
                   ib.accept_prob)

    z_final, (samples, acc_cp, acc_ncp) = jax.lax.scan(
        sample_step, z0, jax.random.split(ks, config.num_samples))

    # stats holds only array/scalar leaves so the whole runner can sit
    # inside jax.jit (the sharded path jits it; parallel/sharded.py)
    stats = {
        "step_size_cp": ss_cp,
        "step_size_ncp": ss_ncp,
        "accept_prob_cp": acc_cp,
        "accept_prob_ncp": acc_ncp,
        "rescued_chains": stuck,
        "num_grad_evals_per_sample": 2 * config.num_leapfrog_steps,
    }
    return samples, stats
