"""Model interpreters: log-density, latent structure, potential functions.

TPU-native replacement for `ed.make_log_joint_fn` (SURVEY.md §4.1 [L1]).
The output of everything here is a *pure* function of JAX arrays — ready
for `jax.grad`, `vmap` over chains, and `jit`.  The reference's equivalent
("build TF graph, call session.run") is gone entirely: a potential function
produced here is traced once and lives inside a single compiled program.

Key objects:

- `log_density(model, args, kwargs, params)` → (scalar log-joint, trace)
- `ModelInfo` — discovered latent structure: names, shapes, support
  bijectors, and a fixed flattening of all latents into one f32 vector
  (the HMC state layout: chains stack these vectors into a (C, D) array,
  which is the TPU-friendly dense layout for the vectorised sampler).
- `make_potential_fn` — U(z) = -log p(constrain(z)) - log|det J| on the
  flat unconstrained vector.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import handlers

__all__ = [
    "log_density",
    "LatentSpec",
    "ModelInfo",
    "get_model_info",
    "make_potential_fn",
]


def log_density(model: Callable, model_args: tuple = (),
                model_kwargs: Optional[dict] = None,
                params: Optional[Dict[str, Any]] = None):
    """Sum of log_prob over all sample sites (latents substituted from
    `params`, observed sites at their observed values).

    Returns (log_joint, trace_sites).  Every latent site must receive a
    value via `params`; this function never draws samples.
    """
    model_kwargs = model_kwargs or {}
    tr = handlers.trace(
        handlers.substitute(model, data=params or {}))
    sites = tr.get_trace(*model_args, **model_kwargs)
    lp = jnp.zeros((), dtype=jnp.result_type(float))
    for name, site in sites.items():
        if site.is_deterministic:
            continue
        if site.value is None:
            raise RuntimeError(
                f"latent site {name!r} has no value: pass it via params")
        lp = lp + jnp.sum(site.dist.log_prob(site.value))
    return lp, sites


@dataclasses.dataclass(frozen=True)
class LatentSpec:
    name: str
    shape: Tuple[int, ...]
    size: int
    offset: int  # position in the flat vector
    bijector: Any  # unconstraining bijector (support map)


@dataclasses.dataclass(frozen=True)
class ModelInfo:
    """Static latent structure of a (possibly reparameterised) model."""

    latents: Tuple[LatentSpec, ...]
    dim: int

    @property
    def names(self):
        return tuple(s.name for s in self.latents)

    # -- flat vector <-> dict of unconstrained arrays -------------------
    def unravel(self, flat):
        # Static slice, NOT dynamic_slice: offsets are Python ints, and
        # under vmap a dynamic_slice batches to gather (whose gradient
        # is scatter) while a static slice stays a slice (gradient:
        # pad).  Mosaic (Pallas TPU) can lower slice/pad inside the
        # fused kernel but not these gathers — and XLA fuses
        # slice+pad more cheaply everywhere else too.
        out = {}
        for s in self.latents:
            out[s.name] = jax.lax.slice_in_dim(
                flat, s.offset, s.offset + s.size).reshape(s.shape)
        return out

    def ravel(self, values: Dict[str, Any]):
        parts = [jnp.asarray(values[s.name], jnp.result_type(float)).reshape(
            (s.size,)) for s in self.latents]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))

    # -- constrained <-> unconstrained ---------------------------------
    def constrain(self, flat):
        """Flat unconstrained vector -> dict of constrained values."""
        unc = self.unravel(flat)
        return {s.name: s.bijector.forward(unc[s.name])
                for s in self.latents}

    def unconstrain(self, values: Dict[str, Any]):
        """Dict of constrained values -> flat unconstrained vector."""
        unc = {s.name: s.bijector.inverse(jnp.asarray(
            values[s.name], jnp.result_type(float)))
            for s in self.latents}
        return self.ravel(unc)

    def constrain_with_logdet(self, flat):
        unc = self.unravel(flat)
        out, logdet = {}, jnp.zeros((), jnp.result_type(float))
        for s in self.latents:
            out[s.name] = s.bijector.forward(unc[s.name])
            logdet = logdet + jnp.sum(s.bijector.log_det_jacobian(unc[s.name]))
        return out, logdet


def get_model_info(model: Callable, model_args: tuple = (),
                   model_kwargs: Optional[dict] = None,
                   seed: int = 0) -> ModelInfo:
    """Discover latent sites by running one seeded trace of the model."""
    model_kwargs = model_kwargs or {}
    key = jax.random.PRNGKey(seed)
    tr = handlers.trace(handlers.seed(model, key=key))
    sites = tr.get_trace(*model_args, **model_kwargs)
    specs = []
    offset = 0
    for name, site in sites.items():
        if site.observed or site.is_deterministic:
            continue
        b = site.dist.support_bijector()
        if b is None:
            raise ValueError(
                f"latent site {name!r} has discrete support; it cannot be "
                "an HMC latent (observe it or marginalise it out)")
        # LatentSpec.shape is the UNCONSTRAINED layout (what unravel
        # reshapes to and bijector.forward consumes); identical to the
        # site's value shape except for dimension-changing support maps
        # (Dirichlet's stick-breaking: K -> K-1 on the last axis).
        shape = tuple(b.unconstrained_shape(tuple(jnp.shape(site.value))))
        size = 1
        for d in shape:
            size *= int(d)
        specs.append(LatentSpec(name=name, shape=shape, size=size,
                                offset=offset, bijector=b))
        offset += size
    return ModelInfo(latents=tuple(specs), dim=offset)


def make_potential_fn(model: Callable, info: ModelInfo,
                      model_args: tuple = (),
                      model_kwargs: Optional[dict] = None):
    """U(z) for flat unconstrained z:  U = -(log p(y) + log|det dy/dz|).

    This is the function HMC differentiates — the reference's hot loop
    (SURVEY.md §4.1 ★) evaluated `target_log_prob` gradients via TF graph
    ops; here it is a pure jax function, `vmap`-able over a (C, D) chain
    batch and fully fused by XLA.
    """

    def potential(flat):
        constrained, logdet = info.constrain_with_logdet(flat)
        lp, _ = log_density(model, model_args, model_kwargs, constrained)
        return -(lp + logdet)

    return potential


def sample_prior(model: Callable, key, model_args: tuple = (),
                 model_kwargs: Optional[dict] = None) -> Dict[str, Any]:
    """Draw one joint prior sample of all latent sites (constrained)."""
    model_kwargs = model_kwargs or {}
    tr = handlers.trace(handlers.seed(model, key=key))
    sites = tr.get_trace(*model_args, **model_kwargs)
    return collections.OrderedDict(
        (name, site.value) for name, site in sites.items()
        if not site.observed and not site.is_deterministic)
