"""Reparameterisation strategies: CP, NCP, VIP (cVIP/dVIP).

TPU-native rebuild of the reference's core contribution
(`program_transformations.py` → `make_learnable_parametrisation` and the
NCP interceptor; SURVEY.md §3.1 "Reparameterisation transforms", §4.2).
A strategy rewrites one latent site

    z ~ F(loc, scale)          (location-scale family, e.g. Normal)

into an auxiliary latent plus a deterministic map:

    CP  (λ=1):  identity — the site is untouched.
    NCP (λ=0):  ẑ ~ F(0, 1);            z = loc + scale·ẑ
    VIP (λ):    ẑ ~ F(λ·loc, scale^λ);  z = loc + scale^(1−λ)·(ẑ − λ·loc)

λ ∈ [0,1] elementwise per variable (paper eq. for VIP; λ=1 ⇒ CP, λ=0 ⇒
NCP — verified algebraically and by tests/test_reparam.py).  No Jacobian
terms appear because the rewrite *redefines which variable is latent*:
the joint density is taken directly over ẑ.

LogNormal sites are reparameterised in log-space through their base
normal (`exp(affine(ẑ))`), which is exactly the structure of the
reference's `german_credit_lognormalcentered` model (BASELINE config #4).

MultivariateNormal sites take the *matrix* path (beyond the reference,
which had no correlated priors): NCP is Cholesky non-centering
(ẑ ~ N(0, I), z = μ + Lẑ) and VIP interpolates the Cholesky factor
row-wise — see VIP._apply_matrix.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .. import dists as d
from ..core.messenger import sample

__all__ = ["ReparamStrategy", "CP", "NCP", "VIP", "TailTransport",
           "AUX_SUFFIX", "is_eligible", "is_transport_eligible",
           "aux_name"]

#: Suffix appended to the original site name for the auxiliary latent.
AUX_SUFFIX = "::base"


def aux_name(name: str) -> str:
    return name + AUX_SUFFIX


def is_eligible(dist) -> bool:
    """A site can be CP/NCP/VIP-rewritten if it is an elementwise
    location-scale family (directly or through a log transform) or a
    matrix location-scale family (MultivariateNormal)."""
    return (getattr(dist, "loc_scale", lambda: None)() is not None
            or hasattr(dist, "base_loc_scale")
            or getattr(dist, "matrix_loc_scale", lambda: None)()
            is not None)


def is_transport_eligible(dist) -> bool:
    """A site can be Gaussian-tail-transported if its distribution
    exposes `transport_from_normal` (a stable F⁻¹∘Φ; heavy-tailed scale
    families like HalfCauchy)."""
    return hasattr(dist, "transport_from_normal")


def _matrix_loc_scale(dist):
    return getattr(dist, "matrix_loc_scale", lambda: None)()


def _split_loc_scale(dist):
    """Return (loc, scale, base_factory, push_forward).

    base_factory(new_loc, new_scale) builds the aux distribution;
    push_forward(x) maps the reassembled location-scale value into the
    site's support (identity, or exp for LogNormal-style sites).
    """
    ls = dist.loc_scale()
    if ls is not None:
        return ls[0], ls[1], dist.with_loc_scale, lambda x: x
    if hasattr(dist, "base_loc_scale"):
        loc, scale = dist.base_loc_scale()
        return loc, scale, d.Normal, jnp.exp
    raise ValueError(f"site distribution {dist!r} is not reparameterisable")


class ReparamStrategy:
    """Rewrites one sample-site message. Returns the model-space value.

    `msg` (when passed) lets a strategy attach metadata to the rewritten
    site — NCP/VIP record the pre-exp log-space value of LogNormal-style
    sites as `msg.metadata["log_value"]` so readouts (recover_fn) can
    report scale sites in log space without an overflow-prone exp→log
    round trip.
    """

    def apply(self, name: str, dist, sample_shape, msg=None) -> Any:
        raise NotImplementedError


class CP(ReparamStrategy):
    """Centered parameterisation — identity (reference: the model as
    written; SURVEY.md §1 item 2)."""

    def apply(self, name, dist, sample_shape, msg=None):
        return None  # signal "leave the site untouched"


class NCP(ReparamStrategy):
    """Non-centered: ẑ ~ F(0,1), z = loc + scale·ẑ."""

    def apply(self, name, dist, sample_shape, msg=None):
        mls = _matrix_loc_scale(dist)
        if mls is not None:
            # Cholesky non-centering: ẑ ~ N(0, I), z = loc + L·ẑ (the
            # Stan-idiomatic rewrite for correlated random effects).
            loc, L = mls
            K = jnp.shape(L)[-1]
            shape = jnp.broadcast_shapes(jnp.shape(loc),
                                         jnp.shape(L)[:-1])
            aux = sample(aux_name(name),
                         d.MultivariateNormal(jnp.zeros(shape),
                                              jnp.eye(K)),
                         sample_shape=sample_shape,
                         _metadata={"aux_of": name, "strategy": "ncp"})
            return loc + jnp.einsum("...ij,...j->...i", L, aux)
        loc, scale, base, push = _split_loc_scale(dist)
        shape = jnp.broadcast_shapes(jnp.shape(loc), jnp.shape(scale))
        aux = sample(aux_name(name),
                     base(jnp.zeros(shape), jnp.ones(shape)),
                     sample_shape=sample_shape,
                     _metadata={"aux_of": name, "strategy": "ncp"})
        z = loc + scale * aux
        if msg is not None and push is jnp.exp:
            msg.metadata["log_value"] = z
        return push(z)


class TailTransport(ReparamStrategy):
    """Gaussian tail transport: ẑ ~ N(0,1), z = F⁻¹(Φ(ẑ)).

    CP/NCP/VIP fix parent↔child *funnels*, but a heavy-tailed scale
    prior with constant parameters (σ ~ HalfCauchy(1), the standard
    weakly-informative choice) has nothing to non-center — its
    unconstrained log-σ coordinate keeps exponential tails, whose
    energy marginal the Gaussian momentum refresh cannot traverse
    (Stan's E-BFMI < 0.3 pathology; Betancourt 2016 arXiv:1604.00695).
    The transport replaces the site with a *standard normal* latent and
    pushes it through the prior's quantile, making the unconstrained
    geometry Gaussian in the prior-dominated regime.  No Jacobian terms
    appear for the same reason as NCP/VIP: the joint density is taken
    over ẑ, whose prior is exactly N(0,1) by construction of the
    transport map.

    Beyond the reference (its TF1 code had no transport machinery);
    eligibility is `dist.transport_from_normal` (dists.HalfCauchy).
    """

    def apply(self, name, dist, sample_shape, msg=None):
        transport = getattr(dist, "transport_from_normal", None)
        if transport is None:
            return None
        shape = tuple(sample_shape) + tuple(dist.batch_shape)
        aux = sample(aux_name(name),
                     d.Normal(jnp.zeros(shape), jnp.ones(shape)),
                     _metadata={"aux_of": name, "strategy": "tail"})
        value, log_value = transport(aux)
        if msg is not None and log_value is not None:
            msg.metadata["log_value"] = log_value
        return value


class VIP(ReparamStrategy):
    """Variationally-inferred parameterisation with fixed λ values.

    λ is an array broadcastable to the site's shape (elementwise λ, the
    paper's per-variable λ; pass a scalar for a tied λ per site).  During
    VI the λ passed here is an optimizer-traced array, so the resulting
    ELBO is differentiable w.r.t. λ; during HMC it is a constant.
    """

    def __init__(self, lam):
        self.lam = lam

    def apply(self, name, dist, sample_shape, msg=None):
        lam = self.lam
        mls = _matrix_loc_scale(dist)
        if mls is not None:
            return self._apply_matrix(name, mls, sample_shape, lam)
        loc, scale, base, push = _split_loc_scale(dist)
        # σ^λ via exp(λ·logσ): stable for σ>0, one log per site.
        log_scale = jnp.log(scale)
        # The aux distribution's batch shape is broadcast(λ, loc, scale);
        # an elementwise λ (the default: full site shape) already covers
        # the site's sample_shape, so only the *uncovered* leading dims
        # remain as the aux sample_shape — otherwise a site like
        # Normal(mu, tau) with sample_shape=(8,) and λ of shape (8,)
        # would produce an (8, 8) auxiliary.
        param_shape = jnp.broadcast_shapes(jnp.shape(loc),
                                           jnp.shape(scale))
        site_shape = tuple(sample_shape) + param_shape
        batch_shape = jnp.broadcast_shapes(jnp.shape(lam), param_shape)
        extra = len(site_shape) - len(batch_shape)
        if site_shape[extra:] != batch_shape:
            raise ValueError(
                f"VIP site {name!r}: lambda shape {jnp.shape(lam)} does "
                f"not broadcast against site shape {site_shape}")
        aux = sample(aux_name(name),
                     base(lam * loc, jnp.exp(lam * log_scale)),
                     sample_shape=site_shape[:extra],
                     _metadata={"aux_of": name, "strategy": "vip"})
        z = loc + jnp.exp((1.0 - lam) * log_scale) * (aux - lam * loc)
        if msg is not None and push is jnp.exp:
            msg.metadata["log_value"] = z
        return push(z)

    def _apply_matrix(self, name, mls, sample_shape, lam):
        """Matrix VIP for MultivariateNormal sites.

        Interpolated Cholesky factor (row-wise λ, broadcastable to the
        event axis K):

            M_λ = diag(d^λ) + λ∘strictlower(L)      (d = diag(L) > 0)
            ẑ ~ MVN(λ∘loc, M_λ);   z = loc + L · M_λ⁻¹ (ẑ − λ∘loc)

        λ=1 gives M=L hence z=ẑ (CP exactly); λ=0 gives M=I hence
        ẑ ~ N(0,I), z = loc + Lẑ (Cholesky NCP exactly).  d^λ > 0 and
        the λ-scaled strict-lower part keep M_λ a valid Cholesky factor
        for every λ ∈ [0,1]; the deterministic map is one triangular
        solve + one triangular matmul (MXU work), differentiable in λ
        for the joint (q, λ) ELBO (SURVEY.md §4.2)."""
        from jax.scipy.linalg import solve_triangular

        loc, L = mls
        L = jnp.asarray(L)
        K = jnp.shape(L)[-1]
        eye = jnp.eye(K, dtype=L.dtype)
        diag = jnp.diagonal(L, axis1=-2, axis2=-1)          # (..., K)
        lam = jnp.asarray(lam)
        rows = jnp.broadcast_shapes(jnp.shape(lam), (K,))
        if rows[-1] != K:
            raise ValueError(
                f"matrix-VIP site {name!r}: lambda shape "
                f"{jnp.shape(lam)} does not broadcast against the "
                f"event axis ({K},)")
        lam_row = jnp.broadcast_to(lam, rows)               # (..., K)
        M = (L * (1.0 - eye) * lam_row[..., :, None]
             + eye * (diag ** lam_row)[..., :, None])
        aux = sample(aux_name(name),
                     d.MultivariateNormal(lam * loc, M),
                     sample_shape=sample_shape,
                     _metadata={"aux_of": name, "strategy": "vip"})
        dev = aux - lam * loc
        batch = jnp.broadcast_shapes(jnp.shape(dev)[:-1],
                                     jnp.shape(M)[:-2])
        Mb = jnp.broadcast_to(M, batch + M.shape[-2:])
        devb = jnp.broadcast_to(dev, batch + dev.shape[-1:])
        y = solve_triangular(Mb, devb[..., None], lower=True)[..., 0]
        return loc + jnp.einsum("...ij,...j->...i", L, y)
