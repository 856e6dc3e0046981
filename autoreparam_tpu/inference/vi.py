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
           init_loc: Optional[jnp.ndarray] = None) -> VIResult:
    """Fit mean-field q; if `vip_sites` is given, the model is rewritten
    into VIP form on those sites and λ is learned jointly (cVIP).

    `vip_sites=None` fits plain ADVI on the model as passed (use a
    CP/NCP-rewritten model for the reference's `--inference=VI`
    comparisons, SURVEY.md §4.4).
    """
    model_kwargs = model_kwargs or {}
    key = key if key is not None else jax.random.PRNGKey(0)

    if vip_sites is not None:
        shapes = eligible_sites(model, model_args, model_kwargs)
        missing = [s for s in vip_sites if s not in shapes]
        if missing:
            raise ValueError(f"sites not VIP-eligible: {missing}")
        lam_shapes = {s: shapes[s] for s in vip_sites}
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
    opt_state0 = opt.init(params0)

    def step(carry, key):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(neg_elbo)(params, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    keys = jax.random.split(key, num_steps)
    (params, _), elbos = jax.lax.scan(step, (params0, opt_state0), keys)

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
