from . import bijectors
from .bijectors import (Affine, Bijector, Chain, Exp, Identity, Sigmoid,
                        Softplus, StickBreaking)
from .distributions import (Bernoulli, Beta, Binomial, Categorical,
                            Cauchy, Delta, Dirichlet, Distribution,
                            Exponential, Gamma, HalfCauchy, HalfNormal,
                            InverseGamma, LogNormal, Multinomial,
                            MultivariateNormal, Normal,
                            NormalSufficientStats, Poisson, StudentT,
                            Uniform)
