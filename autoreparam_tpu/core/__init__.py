from .messenger import Messenger, SampleMessage, sample, deterministic
from . import handlers
from .handlers import seed, trace, substitute, condition, block
from .interpreters import (LatentSpec, ModelInfo, get_model_info,
                           log_density, make_potential_fn, sample_prior)
from .predictive import (Predictive, pointwise_log_likelihood,
                         prior_predictive)
