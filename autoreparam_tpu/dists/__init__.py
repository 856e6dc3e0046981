from . import bijectors
from .bijectors import (Affine, Bijector, Chain, Exp, Identity, Sigmoid,
                        Softplus, StickBreaking)
from .distributions import (Bernoulli, Beta, Binomial, Cauchy, Delta,
                            Dirichlet, Distribution, Exponential, Gamma,
                            HalfCauchy, HalfNormal, InverseGamma, LogNormal,
                            Normal, NormalSufficientStats, Poisson,
                            StudentT, Uniform)
