from . import bijectors
from .bijectors import (Affine, Bijector, Chain, Exp, Identity, Sigmoid,
                        Softplus, StickBreaking)
from .distributions import (Bernoulli, Beta, Binomial, Categorical,
                            Cauchy, Delta, Dirichlet, Distribution,
                            Exponential, Gamma, HalfCauchy, HalfNormal,
                            Gumbel, InverseGamma, Laplace, LogNormal,
                            Logistic, Multinomial, MultivariateNormal,
                            NegativeBinomial, Normal,
                            NormalSufficientStats, Poisson, StudentT,
                            Uniform)
