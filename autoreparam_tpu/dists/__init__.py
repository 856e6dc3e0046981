from . import bijectors
from .bijectors import (Affine, Bijector, Chain, Exp, Identity, Sigmoid,
                        Softplus)
from .distributions import (Bernoulli, Binomial, Cauchy, Delta, Distribution,
                            Exponential, Gamma, HalfCauchy, HalfNormal,
                            InverseGamma, LogNormal, Normal,
                            NormalSufficientStats, Poisson,
                            StudentT, Uniform)
