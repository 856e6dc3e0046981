from .strategies import (AUX_SUFFIX, CP, NCP, VIP, ReparamStrategy,
                         aux_name, is_eligible)
from .handler import (eligible_sites, make_cp_model, make_ncp_model,
                      make_vip_model, recover_fn, reparam)
