"""Posterior-predictive and prior-predictive sampling.

Framework-completeness API on top of the effect handlers: given
posterior draws of the latents (from any engine, in model space),
replay the generative program with latents substituted and observation
sites *resampled* — vectorised over draws with `vmap`, so predictive
generation is one compiled program like everything else.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax

from . import handlers
from .messenger import Messenger, SampleMessage

__all__ = ["Predictive", "pointwise_log_likelihood",
           "prior_predictive"]


class _ForceResample(Messenger):
    """Strip `obs` from observation sites so they are drawn fresh."""

    def process_message(self, msg: SampleMessage) -> None:
        if msg.observed:
            msg.observed = False
            msg.value = None


class Predictive:
    """Vectorised predictive distribution.

        pred = Predictive(model, posterior_samples)   # dict of (N, ...)
        ys = pred(key, *model_args)                   # dict of (N, ...)

    `posterior_samples` maps site names to arrays with a leading draw
    axis (model-space values, e.g. from ExperimentResult samples or
    recover_fn).  Sites not provided are sampled from the program
    (ancestral), observation sites are always re-sampled.
    """

    def __init__(self, model: Callable,
                 posterior_samples: Optional[Dict] = None,
                 return_sites: Optional[tuple] = None):
        self.model = model
        self.samples = posterior_samples or {}
        self.return_sites = return_sites

    def __call__(self, key, *args, **kwargs):
        sample_arrays = dict(self.samples)
        if sample_arrays:
            n = next(iter(sample_arrays.values())).shape[0]
        else:
            n = 1

        def one(key, subst):
            tr = handlers.trace(
                handlers.seed(
                    handlers.substitute(_ForceResample(self.model),
                                        data=subst),
                    key=key))
            sites = tr.get_trace(*args, **kwargs)
            out = {}
            for name, site in sites.items():
                if self.return_sites and name not in self.return_sites:
                    continue
                out[name] = site.value
            return out

        keys = jax.random.split(key, n)
        return jax.vmap(one)(keys, sample_arrays)


def pointwise_log_likelihood(model: Callable, posterior_samples: Dict,
                             model_args: tuple = (), model_kwargs=None):
    """Per-draw, per-datapoint log-likelihood of every observed site —
    the input to LOO/WAIC model comparison.  Returns a dict
    site -> (num_draws, *obs_shape)."""
    model_kwargs = model_kwargs or {}

    def one(subst):
        tr = handlers.trace(
            handlers.substitute(model, data=subst))
        sites = tr.get_trace(*model_args, **model_kwargs)
        return {name: s.dist.log_prob(s.value)
                for name, s in sites.items() if s.observed}

    return jax.vmap(one)(posterior_samples)


def prior_predictive(model: Callable, key, num_samples: int,
                     model_args: tuple = (), model_kwargs=None,
                     return_sites: Optional[tuple] = None):
    """Draw `num_samples` joint samples of every site (prior + synthetic
    observations) — the SBC outer loop's data generator."""
    model_kwargs = model_kwargs or {}

    def one(key):
        tr = handlers.trace(
            handlers.seed(_ForceResample(model), key=key))
        sites = tr.get_trace(*model_args, **model_kwargs)
        return {name: s.value for name, s in sites.items()
                if not return_sites or name in return_sites}

    return jax.vmap(one)(jax.random.split(key, num_samples))
