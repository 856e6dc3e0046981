"""Distributions in pure jax.numpy — the L1' layer of SURVEY.md §8.1.

TPU-native replacement for the slice of `tfp.distributions` the reference
uses (Normal/HalfNormal/HalfCauchy/LogNormal/Gamma/StudentT/Bernoulli/
Binomial; SURVEY.md §3.1 "Model zoo", §8.1 dists/).  Semantics are
deliberately simple and TPU-friendly:

- Everything is **elementwise**: `log_prob(x)` broadcasts parameters
  against `x` and returns an array of per-element log-densities; the
  log-joint machinery sums all elements.  (The reference relied on TFP
  batch shapes the same way.)
- All math is float32-safe — no f64 anywhere on the hot path.
- Location-scale families expose `loc_scale()` so the reparameterisation
  layer (CP/NCP/VIP) can rewrite them generically, and `with_loc_scale`
  to rebuild the same family with new parameters.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from . import bijectors as bij

__all__ = [
    "Distribution", "Normal", "HalfNormal", "Cauchy", "HalfCauchy",
    "LogNormal", "Exponential", "Gamma", "InverseGamma", "Beta",
    "Dirichlet", "StudentT", "Laplace", "Gumbel", "Logistic",
    "NegativeBinomial", "Uniform", "Bernoulli", "Binomial",
    "Categorical", "Multinomial", "MultivariateNormal",
    "Poisson", "Delta",
]

_LOG_2PI = math.log(2.0 * math.pi)


def _bshape(*xs):
    return jnp.broadcast_shapes(*(jnp.shape(x) for x in xs))


class Distribution:
    """Base class. Subclasses define batch_shape, sample_std/log_prob."""

    #: Bijector mapping unconstrained R -> support (None = discrete /
    #: cannot be a latent in HMC).
    def support_bijector(self) -> Optional[bij.Bijector]:
        return bij.Identity()

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError

    def sample(self, key, sample_shape: Tuple[int, ...] = ()):
        raise NotImplementedError

    def log_prob(self, x):
        raise NotImplementedError

    # -- reparameterisation protocol (CP/NCP/VIP) -----------------------
    def loc_scale(self):
        """Return (loc, scale) if this is an elementwise location-scale
        family eligible for NCP/VIP rewriting, else None."""
        return None

    def with_loc_scale(self, loc, scale):
        raise NotImplementedError(
            f"{type(self).__name__} is not a location-scale family")

    def matrix_loc_scale(self):
        """Return (loc, scale_tril) if this is a matrix location-scale
        family (correlated over the last axis) eligible for Cholesky
        non-centering / matrix VIP, else None."""
        return None

    def __repr__(self):
        return type(self).__name__


class Normal(Distribution):
    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        z = jax.random.normal(key, shape, dtype=jnp.result_type(float))
        return self.loc + self.scale * z

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI

    def loc_scale(self):
        return self.loc, self.scale

    def with_loc_scale(self, loc, scale):
        return Normal(loc, scale)


class HalfNormal(Distribution):
    def __init__(self, scale=1.0):
        self.scale = scale

    def support_bijector(self):
        return bij.Exp()

    @property
    def batch_shape(self):
        return jnp.shape(self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        z = jax.random.normal(key, shape, dtype=jnp.result_type(float))
        return jnp.abs(z) * self.scale

    def log_prob(self, x):
        z = x / self.scale
        return (math.log(2.0) - 0.5 * z * z - jnp.log(self.scale)
                - 0.5 * _LOG_2PI)


class Cauchy(Distribution):
    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        z = jax.random.cauchy(key, shape, dtype=jnp.result_type(float))
        return self.loc + self.scale * z

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -math.log(math.pi) - jnp.log(self.scale) - jnp.log1p(z * z)

    def loc_scale(self):
        return self.loc, self.scale

    def with_loc_scale(self, loc, scale):
        return Cauchy(loc, scale)


class HalfCauchy(Distribution):
    def __init__(self, scale=1.0):
        self.scale = scale

    def support_bijector(self):
        return bij.Exp()

    @property
    def batch_shape(self):
        return jnp.shape(self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        z = jax.random.cauchy(key, shape, dtype=jnp.result_type(float))
        return jnp.abs(z) * self.scale

    def log_prob(self, x):
        z = x / self.scale
        return (math.log(2.0 / math.pi) - jnp.log(self.scale)
                - jnp.log1p(z * z))

    def transport_from_normal(self, z):
        """Gaussian tail transport F⁻¹(Φ(z)): maps z ~ N(0,1) exactly to
        this HalfCauchy (reparam.strategies.TailTransport).

        F⁻¹(u) = s·tan(πu/2); computed via the complement
        1−Φ(z) = ½·erfc(z/√2) so the right tail (where tan(πu/2)
        diverges as u→1) stays f32-stable: x = s / tan(π·(1−Φ(z))/2).
        Returns (value, log_value) — the log form feeds log-space
        readouts/diagnostics (recover_fn), mirroring the exp-map sites.
        """
        uc = 0.5 * jax.scipy.special.erfc(z / math.sqrt(2.0))
        t = jnp.tan(0.5 * jnp.pi * uc)
        x = self.scale / t
        log_x = jnp.log(self.scale) - jnp.log(t)
        return x, log_x


class LogNormal(Distribution):
    """exp(Normal(loc, scale)).  Exposes the underlying normal's
    (loc, scale) through `base_loc_scale` so NCP/VIP can reparameterise in
    log-space (the reference's `german_credit_lognormalcentered` model is
    exactly this pattern; SURVEY.md §1, BASELINE config #4)."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    def support_bijector(self):
        return bij.Exp()

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        z = jax.random.normal(key, shape, dtype=jnp.result_type(float))
        return jnp.exp(self.loc + self.scale * z)

    def log_prob(self, x):
        logx = jnp.log(x)
        z = (logx - self.loc) / self.scale
        return (-0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI - logx)

    # Not itself location-scale, but its log is:
    def base_loc_scale(self):
        return self.loc, self.scale


class Exponential(Distribution):
    def __init__(self, rate=1.0):
        self.rate = rate

    def support_bijector(self):
        return bij.Exp()

    @property
    def batch_shape(self):
        return jnp.shape(self.rate)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        e = jax.random.exponential(key, shape, dtype=jnp.result_type(float))
        return e / self.rate

    def log_prob(self, x):
        return jnp.log(self.rate) - self.rate * x


class Gamma(Distribution):
    def __init__(self, concentration, rate=1.0):
        self.concentration = concentration
        self.rate = rate

    def support_bijector(self):
        return bij.Exp()

    @property
    def batch_shape(self):
        return _bshape(self.concentration, self.rate)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        conc = jnp.broadcast_to(self.concentration, shape)
        g = jax.random.gamma(key, conc, dtype=jnp.result_type(float))
        return g / self.rate

    def log_prob(self, x):
        a, b = self.concentration, self.rate
        return (a * jnp.log(b) - gammaln(a) + (a - 1.0) * jnp.log(x) - b * x)


class InverseGamma(Distribution):
    def __init__(self, concentration, scale=1.0):
        self.concentration = concentration
        self.scale = scale

    def support_bijector(self):
        return bij.Exp()

    @property
    def batch_shape(self):
        return _bshape(self.concentration, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        conc = jnp.broadcast_to(self.concentration, shape)
        g = jax.random.gamma(key, conc, dtype=jnp.result_type(float))
        return self.scale / g

    def log_prob(self, x):
        a, b = self.concentration, self.scale
        return (a * jnp.log(b) - gammaln(a) - (a + 1.0) * jnp.log(x) - b / x)


class Beta(Distribution):
    def __init__(self, concentration1, concentration0):
        self.concentration1 = concentration1  # "a" (successes + 1)
        self.concentration0 = concentration0  # "b"

    def support_bijector(self):
        return bij.Sigmoid()

    @property
    def batch_shape(self):
        return _bshape(self.concentration1, self.concentration0)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.beta(key, self.concentration1,
                               self.concentration0, shape,
                               dtype=jnp.result_type(float))

    def log_prob(self, x):
        a, b = self.concentration1, self.concentration0
        betaln = gammaln(a) + gammaln(b) - gammaln(a + b)
        return ((a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log1p(-x)
                - betaln)


class Dirichlet(Distribution):
    """Dirichlet over the last axis of `concentration` (shape (..., K)).

    The only non-elementwise family: a latent Dirichlet site occupies
    K-1 unconstrained coordinates via the StickBreaking support map
    (bijectors.py), and `log_prob` reduces the event axis — the summed
    log-joint is unchanged by where the reduction happens.
    """

    def __init__(self, concentration):
        self.concentration = concentration

    def support_bijector(self):
        return bij.StickBreaking()

    @property
    def batch_shape(self):
        # includes the event axis: samples have this full shape
        return jnp.shape(self.concentration)

    def sample(self, key, sample_shape=()):
        conc = jnp.asarray(self.concentration, jnp.result_type(float))
        batch = tuple(sample_shape) + conc.shape[:-1]
        return jax.random.dirichlet(key, conc, batch,
                                    dtype=jnp.result_type(float))

    def log_prob(self, x):
        conc = jnp.asarray(self.concentration, jnp.result_type(float))
        return (jnp.sum((conc - 1.0) * jnp.log(x), axis=-1)
                + gammaln(jnp.sum(conc, axis=-1))
                - jnp.sum(gammaln(conc), axis=-1))


class StudentT(Distribution):
    def __init__(self, df, loc=0.0, scale=1.0):
        self.df = df
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.df, self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        df = jnp.broadcast_to(jnp.asarray(self.df, jnp.result_type(float)),
                              shape)
        z = jax.random.t(key, df, shape, dtype=jnp.result_type(float))
        return self.loc + self.scale * z

    def log_prob(self, x):
        df = self.df
        z = (x - self.loc) / self.scale
        return (gammaln((df + 1.0) / 2.0) - gammaln(df / 2.0)
                - 0.5 * (jnp.log(df) + math.log(math.pi))
                - jnp.log(self.scale)
                - (df + 1.0) / 2.0 * jnp.log1p(z * z / df))

    def loc_scale(self):
        return self.loc, self.scale

    def with_loc_scale(self, loc, scale):
        return StudentT(self.df, loc, scale)


class Laplace(Distribution):
    """Location-scale (so NCP/VIP-eligible): robust-regression priors."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        z = jax.random.laplace(key, shape, dtype=jnp.result_type(float))
        return self.loc + self.scale * z

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -jnp.abs(z) - math.log(2.0) - jnp.log(self.scale)

    def loc_scale(self):
        return self.loc, self.scale

    def with_loc_scale(self, loc, scale):
        return Laplace(loc, scale)


class Gumbel(Distribution):
    """Location-scale (so NCP/VIP-eligible): extreme-value models."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        z = jax.random.gumbel(key, shape, dtype=jnp.result_type(float))
        return self.loc + self.scale * z

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -(z + jnp.exp(-z)) - jnp.log(self.scale)

    def loc_scale(self):
        return self.loc, self.scale

    def with_loc_scale(self, loc, scale):
        return Gumbel(loc, scale)


class Logistic(Distribution):
    """Location-scale (so NCP/VIP-eligible)."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        z = jax.random.logistic(key, shape, dtype=jnp.result_type(float))
        return self.loc + self.scale * z

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return (-z - 2.0 * jax.nn.softplus(-z) - jnp.log(self.scale))

    def loc_scale(self):
        return self.loc, self.scale

    def with_loc_scale(self, loc, scale):
        return Logistic(loc, scale)


class NegativeBinomial(Distribution):
    """Overdispersed counts (Gamma–Poisson mixture); observed sites only.
    `logits` is the log-odds of a "success" (TFP convention): mean =
    total_count * exp(logits)."""

    def __init__(self, total_count, logits):
        self.total_count = total_count
        self.logits = logits

    def support_bijector(self):
        return None

    @property
    def batch_shape(self):
        return _bshape(self.total_count, self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        k_g, k_p = jax.random.split(key)
        r = jnp.broadcast_to(
            jnp.asarray(self.total_count, jnp.result_type(float)), shape)
        # rate of the mixed Poisson: Gamma(r, scale = p/(1-p) = e^logits)
        lam = (jax.random.gamma(k_g, r, dtype=jnp.result_type(float))
               * jnp.exp(jnp.broadcast_to(
                   jnp.asarray(self.logits, jnp.result_type(float)),
                   shape)))
        return jax.random.poisson(k_p, lam, shape).astype(
            jnp.result_type(float))

    def log_prob(self, x):
        r = jnp.asarray(self.total_count, jnp.result_type(float))
        log_comb = (gammaln(x + r) - gammaln(r) - gammaln(x + 1.0))
        return (log_comb + x * self.logits
                - (x + r) * jax.nn.softplus(self.logits))


class Uniform(Distribution):
    def __init__(self, low=0.0, high=1.0):
        self.low = low
        self.high = high

    def support_bijector(self):
        return bij.Chain(bij.Sigmoid(),
                         bij.Affine(self.low, self.high - self.low))

    @property
    def batch_shape(self):
        return _bshape(self.low, self.high)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(float))
        return self.low + (self.high - self.low) * u

    def log_prob(self, x):
        return jnp.broadcast_to(-jnp.log(self.high - self.low),
                                _bshape(x, self.low, self.high))


class Bernoulli(Distribution):
    """Parameterised by logits (TPU-friendly: no clipping of probs)."""

    def __init__(self, logits):
        self.logits = logits

    def support_bijector(self):
        return None

    @property
    def batch_shape(self):
        return jnp.shape(self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.bernoulli(
            key, jax.nn.sigmoid(self.logits), shape
        ).astype(jnp.result_type(float))

    def log_prob(self, x):
        # x*l - softplus(l) = x log p + (1-x) log(1-p)
        return x * self.logits - jax.nn.softplus(self.logits)


class Binomial(Distribution):
    def __init__(self, total_count, logits):
        self.total_count = total_count
        self.logits = logits

    def support_bijector(self):
        return None

    @property
    def batch_shape(self):
        return _bshape(self.total_count, self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        n = jnp.broadcast_to(
            jnp.asarray(self.total_count, jnp.result_type(float)), shape)
        p = jnp.broadcast_to(jax.nn.sigmoid(self.logits), shape)
        return jax.random.binomial(key, n, p, dtype=jnp.result_type(float))

    def log_prob(self, x):
        n = jnp.asarray(self.total_count, jnp.result_type(float))
        # log C(n, x) via lgamma (x, n float-valued counts)
        log_comb = (gammaln(n + 1.0) - gammaln(x + 1.0)
                    - gammaln(n - x + 1.0))
        return log_comb + x * self.logits - n * jax.nn.softplus(self.logits)


class MultivariateNormal(Distribution):
    """Full-covariance normal over the last axis, parameterised by a
    lower-triangular scale (loc (..., K), scale_tril (..., K, K)).

    The support is all of R^K (Identity map), so MVN latents need no
    bijector bookkeeping; log_prob reduces the event axis (like
    Dirichlet, batch_shape includes it).  The solve is a triangular
    matmul — MXU work, not a gather.  Not *elementwise* location-scale
    (loc_scale() stays None), but it exposes `matrix_loc_scale` so the
    reparam layer can Cholesky-non-center it (ẑ ~ N(0, I), z = μ + Lẑ —
    the Stan-idiomatic form for correlated random effects) and VIP-
    interpolate it row-wise (reparam.strategies matrix path).
    """

    def __init__(self, loc, scale_tril):
        self.loc = loc
        self.scale_tril = scale_tril

    @property
    def batch_shape(self):
        # includes the event axis: samples have this full shape
        return jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale_tril)[:-1])

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        z = jax.random.normal(key, shape, dtype=jnp.result_type(float))
        return self.loc + jnp.einsum("...ij,...j->...i",
                                     self.scale_tril, z)

    def log_prob(self, x):
        L = jnp.asarray(self.scale_tril, jnp.result_type(float))
        dev = x - self.loc
        # solve L y = dev; quad form = |y|^2 (batch dims broadcast —
        # triangular_solve wants them aligned explicitly)
        batch = jnp.broadcast_shapes(jnp.shape(dev)[:-1],
                                     jnp.shape(L)[:-2])
        Lb = jnp.broadcast_to(L, batch + L.shape[-2:])
        devb = jnp.broadcast_to(dev, batch + dev.shape[-1:])
        y = jax.scipy.linalg.solve_triangular(Lb, devb[..., None],
                                              lower=True)[..., 0]
        k = jnp.shape(L)[-1]
        half_logdet = jnp.sum(jnp.log(jnp.abs(
            jnp.diagonal(L, axis1=-2, axis2=-1))), axis=-1)
        return (-0.5 * jnp.sum(y * y, axis=-1) - half_logdet
                - 0.5 * k * _LOG_2PI)

    def matrix_loc_scale(self):
        return self.loc, self.scale_tril


class Categorical(Distribution):
    """Over {0..K-1}; logits on the last axis (TPU-friendly: log_prob
    is a one-hot contraction, no gather)."""

    def __init__(self, logits):
        self.logits = logits

    def support_bijector(self):
        return None

    @property
    def batch_shape(self):
        return jnp.shape(self.logits)[:-1]

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.categorical(
            key, self.logits, shape=shape).astype(jnp.result_type(float))

    def log_prob(self, x):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        k = jnp.shape(self.logits)[-1]
        oh = jax.nn.one_hot(jnp.asarray(x, jnp.int32), k, dtype=logp.dtype)
        return jnp.sum(oh * logp, axis=-1)


class Multinomial(Distribution):
    """Counts over K categories (last axis); logits-parameterised — the
    Dirichlet's conjugate observed family.  Like Dirichlet, batch_shape
    includes the event axis (samples/log_prob inputs carry the full
    (..., K) shape; log_prob reduces it)."""

    def __init__(self, total_count, logits):
        self.total_count = total_count
        self.logits = logits

    def support_bijector(self):
        return None

    @property
    def batch_shape(self):
        return jnp.shape(self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        n = jnp.asarray(self.total_count, jnp.result_type(float))
        p = jax.nn.softmax(jnp.asarray(self.logits,
                                       jnp.result_type(float)), axis=-1)
        return jax.random.multinomial(key, n, p, shape=shape,
                                      dtype=jnp.result_type(float))

    def log_prob(self, x):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        n = jnp.asarray(self.total_count, jnp.result_type(float))
        return (gammaln(n + 1.0) - jnp.sum(gammaln(x + 1.0), axis=-1)
                + jnp.sum(x * logp, axis=-1))


class Poisson(Distribution):
    def __init__(self, rate=None, *, log_rate=None):
        if (rate is None) == (log_rate is None):
            raise ValueError("pass exactly one of rate / log_rate")
        self._log_rate = jnp.log(rate) if rate is not None else log_rate

    def support_bijector(self):
        return None

    @property
    def batch_shape(self):
        return jnp.shape(self._log_rate)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        lam = jnp.broadcast_to(jnp.exp(self._log_rate), shape)
        return jax.random.poisson(key, lam).astype(jnp.result_type(float))

    def log_prob(self, x):
        return x * self._log_rate - jnp.exp(self._log_rate) - gammaln(x + 1.0)


class NormalSufficientStats(Distribution):
    """Likelihood of n iid N(loc, scale) observations through their
    sufficient statistics (n, ȳ, Σ(y−ȳ)²) — an *exact* collapse used to
    shrink grouped-Gaussian likelihoods (radon: 919 homes → 170
    county×floor cells) so the per-chain gradient is cell-count-bound.

    `log_prob(ybar)` returns the full joint log-density of the n
    original observations:
        -n/2·log 2π − n·log σ − (ss + n(ȳ−loc)²) / (2σ²)
    """

    def __init__(self, loc, scale, n, sum_sq_dev):
        self.loc = loc
        self.scale = scale
        self.n = n
        self.sum_sq_dev = sum_sq_dev

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale, self.n, self.sum_sq_dev)

    def sample(self, key, sample_shape=()):
        # the mean of n draws: ȳ ~ N(loc, scale/√n)
        shape = tuple(sample_shape) + self.batch_shape
        z = jax.random.normal(key, shape, dtype=jnp.result_type(float))
        return self.loc + self.scale / jnp.sqrt(self.n) * z

    def log_prob(self, ybar):
        n, s = self.n, self.scale
        dev = ybar - self.loc
        return (-0.5 * n * _LOG_2PI - n * jnp.log(s)
                - (self.sum_sq_dev + n * dev * dev) / (2.0 * s * s))


class Delta(Distribution):
    """Point mass; log_prob is 0 at the point (used for deterministic
    bookkeeping only, never as an HMC latent)."""

    def __init__(self, value):
        self.value = value

    @property
    def batch_shape(self):
        return jnp.shape(self.value)

    def sample(self, key, sample_shape=()):
        return jnp.broadcast_to(self.value,
                                tuple(sample_shape) + self.batch_shape)

    def log_prob(self, x):
        return jnp.zeros(_bshape(x, self.value))
