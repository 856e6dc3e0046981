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
           "Chain"]


class Bijector:
    """y = forward(x) with x unconstrained, y in the support."""

    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def log_det_jacobian(self, x):
        """Elementwise log |d forward / dx| evaluated at unconstrained x."""
        raise NotImplementedError

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
