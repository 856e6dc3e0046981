"""Mean-field VI with joint (q, λ) optimization — cVIP/dVIP.

Rebuild of the reference's VI runner (SURVEY.md §3.1 "VI runner", §4.2):
a mean-field Gaussian surrogate over the *unconstrained* latent space,
reparameterisation-gradient ELBO, Adam (optax), and — the core trick —
the per-variable parameterisation λ of every VIP site optimized jointly
with the variational parameters.

Structural shift from the reference: the TF1 version ran one
`session.run` per Adam step (SURVEY.md §4.2 "hot loop #2"); here the
whole optimization is a single `lax.scan` inside one jitted program.

λ is stored as a logit (sigmoid-constrained to [0,1], matching the
reference's sigmoid-constrained TF variable, SURVEY.md §3.1) and enters
the model through `make_vip_model`, so ∂ELBO/∂λ flows through both the
auxiliary prior N(λμ, σ^λ) and the deterministic reassembly.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.interpreters import (ModelInfo, get_model_info,
                                 make_potential_fn)
from ..reparam import make_vip_model
from ..reparam.handler import eligible_sites

__all__ = ["VIResult", "fit_vi", "fit_vip_vi", "discretize_lambda"]

_LOG_2PI_E = math.log(2.0 * math.pi) + 1.0


class VIResult(NamedTuple):
    loc: jnp.ndarray          # (D,) q means, unconstrained space
    scale: jnp.ndarray        # (D,) q stddevs
    lam: Dict[str, jnp.ndarray]  # learned λ per VIP site (empty if none)
    elbo_trace: jnp.ndarray   # (num_steps,)
    info: ModelInfo           # latent layout of the (reparameterised) model


def _gaussian_entropy(log_scale):
    return jnp.sum(log_scale) + 0.5 * log_scale.size * _LOG_2PI_E


def fit_vi(model: Callable,
           model_args: tuple = (),
           model_kwargs: Optional[dict] = None,
           *,
           vip_sites: Optional[Tuple[str, ...]] = None,
           num_steps: int = 3000,
           num_mc_samples: int = 8,
           learning_rate: float = 0.02,
           lr_schedule: str = "cosine",
           key=None,
           init_loc: Optional[jnp.ndarray] = None,
           num_restarts: int = 1,
           lam_tie: str = "element") -> VIResult:
    """Fit mean-field q; if `vip_sites` is given, the model is rewritten
    into VIP form on those sites and λ is learned jointly (cVIP).

    `vip_sites=None` fits plain ADVI on the model as passed (use a
    CP/NCP-rewritten model for the reference's `--inference=VI`
    comparisons, SURVEY.md §4.4).

    `num_restarts > 1` runs that many independent optimizations (vmapped
    over restart keys — one compiled program, the TPU-native way to
    restart) and keeps the one with the best final ELBO: the joint
    (q, λ) objective is multi-basin on models like german_credit (λ has
    CP-like and NCP-like basins per site), and a single Adam run can
    settle in the worse one.

    `lam_tie="site"` learns ONE λ per VIP site instead of elementwise
    (the paper's per-variable λ is the `"element"` default): for
    exchangeable vector sites (e.g. 25 iid local scales) tying removes
    the per-element λ noise floor — every element shares the evidence.
    """
    model_kwargs = model_kwargs or {}
    key = key if key is not None else jax.random.PRNGKey(0)

    if vip_sites is not None:
        shapes = eligible_sites(model, model_args, model_kwargs)
        missing = [s for s in vip_sites if s not in shapes]
        if missing:
            raise ValueError(f"sites not VIP-eligible: {missing}")
        if lam_tie == "site":
            lam_shapes = {s: () for s in vip_sites}
        elif lam_tie == "element":
            lam_shapes = {s: shapes[s] for s in vip_sites}
        else:
            raise ValueError(f"unknown lam_tie {lam_tie!r}")
        lam_template = {s: jnp.full(sh, 0.5) for s, sh in
                        lam_shapes.items()}
        wrapped = make_vip_model(model, lam_template)
    else:
        lam_shapes = {}
        wrapped = model

    info = get_model_info(wrapped, model_args, model_kwargs)
    D = info.dim

    params0 = {
        "loc": (jnp.zeros((D,)) if init_loc is None
                else jnp.asarray(init_loc)),
        "log_scale": jnp.full((D,), -2.0),
        # λ init 0.5 (logit 0), the reference's neutral start [M]
        "lam_logit": {s: jnp.zeros(sh) for s, sh in lam_shapes.items()},
    }

    def neg_elbo(params, key):
        lam = {s: jax.nn.sigmoid(v)
               for s, v in params["lam_logit"].items()}
        mdl = make_vip_model(model, lam) if vip_sites is not None else model
        pot = make_potential_fn(mdl, info, model_args, model_kwargs)
        scale = jnp.exp(params["log_scale"])
        eps = jax.random.normal(key, (num_mc_samples, D))
        z = params["loc"] + scale * eps
        e_logp = -jnp.mean(jax.vmap(pot)(z))
        return -(e_logp + _gaussian_entropy(params["log_scale"]))

    # Constant LR for 70% of the budget, then a cosine tail to ~0: the
    # tail makes the final (q*, λ*) a near-fixed point of the optimizer
    # instead of a sample from Adam's stationary noise ball — λ* and the
    # q* stddevs feed the HMC phase (init, diagonal mass), so end-of-run
    # noise there directly degrades the sampler.  The constant head
    # keeps short (CI/quick) budgets converging as fast as plain Adam.
    if lr_schedule == "cosine":
        head = int(0.7 * num_steps)
        lr = optax.join_schedules(
            [optax.constant_schedule(learning_rate),
             optax.cosine_decay_schedule(learning_rate,
                                         max(num_steps - head, 1),
                                         alpha=0.02)],
            [head])
    elif lr_schedule == "constant":
        lr = learning_rate
    else:
        raise ValueError(f"unknown lr_schedule {lr_schedule!r}")
    opt = optax.adam(lr)

    def step(carry, key):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(neg_elbo)(params, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    def one_fit(key, perturb):
        # perturb=0 keeps the canonical neutral init (λ=0.5, loc=0);
        # perturbed restarts scatter the λ logits across [σ(-3), σ(3)]
        # and jitter loc — the (q, λ) objective's basins differ chiefly
        # in which side of 0.5 each λ settles, so restarts must *start*
        # in different basins to explore them (same MC keys from the
        # same init would mostly re-find one basin).
        k_init, k_run = jax.random.split(key)
        kl, kc = jax.random.split(k_init)
        p0 = dict(
            params0,
            loc=params0["loc"] + perturb * 0.3 * jax.random.normal(
                kc, params0["loc"].shape),
            lam_logit=jax.tree.map(
                lambda v, k: v + perturb * 3.0 * jax.random.normal(
                    k, v.shape),
                params0["lam_logit"],
                dict(zip(params0["lam_logit"],
                         jax.random.split(kl,
                                          max(len(lam_shapes), 1))[
                             :len(lam_shapes)]))),
        )
        keys = jax.random.split(k_run, num_steps)
        (params, _), elbos = jax.lax.scan(step, (p0, opt.init(p0)), keys)
        return params, elbos

    if num_restarts <= 1:
        params, elbos = one_fit(key, 0.0)
    else:
        # vmapping the whole fit runs the restarts as one batched
        # program — restarts are data parallelism here
        params_k, elbos_k = jax.vmap(one_fit)(
            jax.random.split(key, num_restarts),
            jnp.arange(num_restarts, dtype=jnp.float32).clip(0.0, 1.0))
        score = jnp.mean(elbos_k[:, -100:], axis=-1)
        score = jnp.where(jnp.isfinite(score), score, -jnp.inf)
        best = jnp.argmax(score)
        params = jax.tree.map(lambda a: a[best], params_k)
        elbos = elbos_k[best]

    lam = {s: jax.nn.sigmoid(v) for s, v in params["lam_logit"].items()}
    return VIResult(loc=params["loc"],
                    scale=jnp.exp(params["log_scale"]),
                    lam=lam,
                    elbo_trace=elbos,
                    info=info)


def fit_vip_vi(model: Callable, model_args: tuple = (),
               model_kwargs: Optional[dict] = None, **kw) -> VIResult:
    """cVIP: VIP-rewrite *all* eligible sites and learn their λ."""
    sites = tuple(eligible_sites(model, model_args, model_kwargs or {}))
    return fit_vi(model, model_args, model_kwargs, vip_sites=sites, **kw)


def discretize_lambda(lam: Dict[str, jnp.ndarray],
                      threshold: float = 0.5) -> Dict[str, jnp.ndarray]:
    """dVIP: λ → {0,1} (reference thresholds at 0.5, SURVEY.md §3.1 [M]),
    so each variable is purely CP or NCP."""
    return {s: (v > threshold).astype(v.dtype) for s, v in lam.items()}
