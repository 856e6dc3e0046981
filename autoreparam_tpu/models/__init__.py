from . import data
from .zoo import MODEL_REGISTRY, ModelSpec, get_model, register
from .zoo import (eight_schools_model, neals_funnel_model, radon_model,
                  german_credit_lognormalcentered_model,
                  german_credit_gammascale_model, election88_model,
                  electric_model)
