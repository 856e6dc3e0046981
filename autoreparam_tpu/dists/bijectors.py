"""Elementwise bijectors for constrained↔unconstrained transforms.

TPU-native stand-in for the slice of `tfp.bijectors` the reference leans on
(SURVEY.md L0/L2: Exp/Softplus for positive supports, Sigmoid for [0,1],
affine maps between CP and NCP coordinates).  All maps are elementwise;
`log_det_jacobian` returns the *elementwise* log|dy/dx| (callers sum).
float32 hygiene: softplus/sigmoid use numerically-stable formulations so
the funnel-style geometry doesn't overflow on TPU f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["Bijector", "Identity", "Exp", "Softplus", "Sigmoid", "Affine",
           "StickBreaking", "Chain"]


class Bijector:
    """y = forward(x) with x unconstrained, y in the support."""

    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def log_det_jacobian(self, x):
        """Elementwise log |d forward / dx| evaluated at unconstrained x.

        Non-elementwise bijectors (StickBreaking) return per-coordinate
        contributions of the same shape as x; callers always sum."""
        raise NotImplementedError

    def unconstrained_shape(self, constrained_shape):
        """Shape of the unconstrained x that maps to a constrained value
        of `constrained_shape` (identity for elementwise bijectors; the
        simplex map drops one coordinate on the last axis)."""
        return tuple(constrained_shape)

    def __repr__(self):
        return type(self).__name__


class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def log_det_jacobian(self, x):
        return jnp.zeros_like(x)


class Exp(Bijector):
    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y)

    def log_det_jacobian(self, x):
        return x


class Softplus(Bijector):
    def forward(self, x):
        return jax.nn.softplus(x)

    def inverse(self, y):
        # log(expm1(y)), stable for both small and large y:
        #   y + log1p(-exp(-y))
        return y + jnp.log(-jnp.expm1(-y))

    def log_det_jacobian(self, x):
        # d/dx softplus(x) = sigmoid(x);  log sigmoid(x) = -softplus(-x)
        return -jax.nn.softplus(-x)


class Sigmoid(Bijector):
    def forward(self, x):
        return jax.nn.sigmoid(x)

    def inverse(self, y):
        return jnp.log(y) - jnp.log1p(-y)

    def log_det_jacobian(self, x):
        # log(sigmoid(x) * (1 - sigmoid(x)))
        return -jax.nn.softplus(-x) - jax.nn.softplus(x)


class Affine(Bijector):
    """y = shift + scale * x (scale > 0 elementwise)."""

    def __init__(self, shift, scale):
        self.shift = shift
        self.scale = scale

    def forward(self, x):
        return self.shift + self.scale * x

    def inverse(self, y):
        return (y - self.shift) / self.scale

    def log_det_jacobian(self, x):
        return jnp.broadcast_to(jnp.log(self.scale), jnp.shape(x))


class StickBreaking(Bijector):
    """R^(K-1) -> interior of the K-simplex, along the last axis.

    Stan/NumPyro-style stick-breaking with a log(K-1-k) offset so x = 0
    maps to the uniform simplex.  forward/inverse change the last-axis
    length (K-1 <-> K); `unconstrained_shape` reports that, and
    `log_det_jacobian` returns the (..., K-1) per-stick contributions
    log t_k + log(1-t_k) + log r_k (t_k the sigmoid stick fraction, r_k
    the remaining stick length), which callers sum.  All in log space —
    no cumprod — for f32 hygiene at large K.
    """

    @staticmethod
    def _offset(k1, dtype):
        # log of remaining-stick count: k1, k1-1, ..., 1
        return jnp.log(jnp.arange(k1, 0, -1, dtype=dtype))

    def forward(self, x):
        u = x - self._offset(x.shape[-1], x.dtype)
        log_t = -jax.nn.softplus(-u)       # log sigmoid(u)
        log_1mt = -jax.nn.softplus(u)      # log(1 - sigmoid(u))
        log_r = jnp.concatenate(
            [jnp.zeros_like(x[..., :1]),
             jnp.cumsum(log_1mt, axis=-1)], axis=-1)
        return jnp.concatenate(
            [jnp.exp(log_t + log_r[..., :-1]),
             jnp.exp(log_r[..., -1:])], axis=-1)

    def inverse(self, y):
        k1 = y.shape[-1] - 1
        rem = 1.0 - jnp.cumsum(y[..., :-1], axis=-1)
        r = jnp.concatenate([jnp.ones_like(y[..., :1]),
                             rem[..., :-1]], axis=-1)
        t = y[..., :-1] / r
        return (jnp.log(t) - jnp.log1p(-t)
                + self._offset(k1, y.dtype))

    def log_det_jacobian(self, x):
        u = x - self._offset(x.shape[-1], x.dtype)
        log_t = -jax.nn.softplus(-u)
        log_1mt = -jax.nn.softplus(u)
        log_r = jnp.concatenate(
            [jnp.zeros_like(x[..., :1]),
             jnp.cumsum(log_1mt[..., :-1], axis=-1)], axis=-1)
        return log_t + log_1mt + log_r

    def unconstrained_shape(self, constrained_shape):
        *batch, k = constrained_shape
        if k < 2:
            raise ValueError(f"simplex needs K >= 2, got K={k}")
        return tuple(batch) + (k - 1,)


class Chain(Bijector):
    """forward = parts[-1] ∘ ... ∘ parts[0] (parts applied left to right)."""

    def __init__(self, *parts):
        self.parts = parts

    def forward(self, x):
        for b in self.parts:
            x = b.forward(x)
        return x

    def inverse(self, y):
        for b in reversed(self.parts):
            y = b.inverse(y)
        return y

    def log_det_jacobian(self, x):
        total = jnp.zeros(jnp.shape(x))
        for b in self.parts:
            total = total + b.log_det_jacobian(x)
            x = b.forward(x)
        return total
