from .strategies import (AUX_SUFFIX, CP, NCP, VIP, ReparamStrategy,
                         TailTransport, aux_name, is_eligible,
                         is_transport_eligible)
from .handler import (eligible_sites, make_cp_model, make_ncp_model,
                      make_tail_transport_model, make_vip_model,
                      recover_fn, reparam, transport_sites)
