"""The `reparam` effect handler and model-rewriting utilities.

Replaces the reference's Edward2 `ed.interception(...)` context managers
(SURVEY.md §4.1/§4.2): wrapping a model in `reparam(model, config)` yields
a new generative program in which each configured site has been replaced
by its auxiliary latent + a deterministic site carrying the model-space
value.  Everything downstream (log_density, get_model_info, HMC, VI) works
on the rewritten program unchanged.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

from ..core import handlers
from ..core.interpreters import ModelInfo
from ..core.messenger import Messenger, SampleMessage
from . import strategies
from .strategies import (AUX_SUFFIX, CP, NCP, VIP, ReparamStrategy,
                         TailTransport)

__all__ = ["reparam", "eligible_sites", "transport_sites",
           "make_ncp_model", "make_vip_model", "make_cp_model",
           "make_tail_transport_model", "recover_fn"]


class reparam(Messenger):
    """Apply per-site reparameterisation strategies to a model."""

    def __init__(self, fn: Optional[Callable] = None,
                 config: Optional[Dict[str, ReparamStrategy]] = None):
        super().__init__(fn)
        self.config = config or {}

    def process_message(self, msg: SampleMessage) -> None:
        if msg.is_deterministic or msg.observed or msg.value is not None:
            return
        if msg.metadata.get("aux_of"):
            return  # never rewrite an auxiliary site
        strategy = self.config.get(msg.name)
        if strategy is None or isinstance(strategy, CP):
            return
        value = strategy.apply(msg.name, msg.dist, msg.sample_shape,
                               msg=msg)
        if value is None:
            return
        # The original site becomes a deterministic record of the
        # model-space value; its density now lives on the aux site.
        msg.value = value
        msg.is_deterministic = True


def eligible_sites(model: Callable, model_args: tuple = (),
                   model_kwargs: Optional[dict] = None,
                   seed: int = 0):
    """Names and shapes of latent sites eligible for NCP/VIP rewriting.

    Returns an OrderedDict name -> shape (the site's value shape, which is
    the shape a per-element λ must broadcast to).
    """
    import collections

    import jax

    model_kwargs = model_kwargs or {}
    tr = handlers.trace(
        handlers.seed(model, key=jax.random.PRNGKey(seed)))
    sites = tr.get_trace(*model_args, **model_kwargs)
    out = collections.OrderedDict()
    for name, site in sites.items():
        if site.observed or site.is_deterministic:
            continue
        if site.metadata.get("aux_of"):
            continue  # auxiliaries of an inner rewrite (e.g. transport)
        if strategies.is_eligible(site.dist):
            out[name] = tuple(jnp.shape(site.value))
    return out


def transport_sites(model: Callable, model_args: tuple = (),
                    model_kwargs: Optional[dict] = None,
                    seed: int = 0):
    """Names and shapes of latent sites eligible for the Gaussian tail
    transport (heavy-tailed scale priors; strategies.TailTransport)."""
    import collections

    import jax

    model_kwargs = model_kwargs or {}
    tr = handlers.trace(
        handlers.seed(model, key=jax.random.PRNGKey(seed)))
    sites = tr.get_trace(*model_args, **model_kwargs)
    out = collections.OrderedDict()
    for name, site in sites.items():
        if site.observed or site.is_deterministic:
            continue
        if site.metadata.get("aux_of"):
            continue
        if strategies.is_transport_eligible(site.dist):
            out[name] = tuple(jnp.shape(site.value))
    return out


def make_cp_model(model: Callable) -> Callable:
    """CP = identity; returned as-is for API symmetry."""
    return model


def make_ncp_model(model: Callable, sites=None,
                   model_args: tuple = (),
                   model_kwargs: Optional[dict] = None) -> Callable:
    """Rewrite `sites` (default: all eligible latents) into NCP form."""
    if sites is None:
        sites = list(eligible_sites(model, model_args, model_kwargs))
    cfg = {name: NCP() for name in sites}
    return reparam(model, config=cfg)


def make_tail_transport_model(model: Callable, sites=None,
                              model_args: tuple = (),
                              model_kwargs: Optional[dict] = None
                              ) -> Callable:
    """Rewrite `sites` (default: all transport-eligible latents — heavy-
    tailed scale priors like HalfCauchy) into Gaussian-tail-transport
    form (strategies.TailTransport).  Composes with CP/NCP/VIP: apply
    the transport first, then reparameterise the remaining
    location-scale sites of the wrapped model."""
    if sites is None:
        sites = list(transport_sites(model, model_args, model_kwargs))
    cfg = {name: TailTransport() for name in sites}
    return reparam(model, config=cfg)


def make_vip_model(model: Callable, lam: Dict[str, jnp.ndarray]) -> Callable:
    """Rewrite sites named in `lam` into VIP form with the given λ arrays.

    `lam` maps site name -> λ array broadcastable to the site shape.  Call
    this *inside* a jitted/differentiated function with λ as a traced
    input to get ∂ELBO/∂λ (SURVEY.md §4.2's joint (q, λ) optimization).
    """
    cfg = {name: VIP(l) for name, l in lam.items()}
    return reparam(model, config=cfg)


def recover_fn(model: Callable, info: ModelInfo,
               model_args: tuple = (),
               model_kwargs: Optional[dict] = None,
               log_readout: bool = True) -> Callable:
    """Map a flat unconstrained latent vector -> model-space values.

    For a reparameterised model the HMC chain lives on auxiliary
    coordinates; users want the original variables (reference behaviour:
    Edward2's tape exposed the deterministic transforms).  The returned
    pure function replays the model with the latents substituted and reads
    off every non-observed site, dropping `::base` aux bookkeeping in
    favour of the deterministic model-space records.

    With `log_readout=True` (default), positive-support sites reached
    through an exp map (HalfCauchy/LogNormal-style scales) are reported
    in log space under the name ``log(<site>)``, computed directly from
    the pre-exp quantity.  Rationale: (a) the reference computed ESS on
    the *sampled* coordinates (tfp.mcmc.effective_sample_size on chain
    states, SURVEY.md §3.1 [M]), which are log-space for such sites;
    (b) exp-space moments may not exist (a LogNormal(0, 10) prior has no
    usable f32 moments), so ESS/R-hat on exp values are meaningless and
    can overflow to inf — the german_credit failure mode.
    """
    model_kwargs = model_kwargs or {}
    from ..dists import bijectors as bij
    exp_latents = {s.name for s in info.latents
                   if isinstance(s.bijector, bij.Exp)}

    def recover(flat):
        unc = info.unravel(flat)
        constrained = {s.name: s.bijector.forward(unc[s.name])
                       for s in info.latents}
        tr = handlers.trace(handlers.substitute(model, data=constrained))
        sites = tr.get_trace(*model_args, **model_kwargs)
        out = {}
        for name, site in sites.items():
            if site.observed or name.endswith(AUX_SUFFIX):
                continue
            if log_readout:
                if name in exp_latents:
                    out[f"log({name})"] = unc[name]
                    continue
                log_value = site.metadata.get("log_value")
                if log_value is not None:
                    out[f"log({name})"] = log_value
                    continue
            out[name] = site.value
        return out

    return recover
