from .mesh import (CHAIN_AXIS, DCN_AXIS, make_mesh,
                   make_mesh_hierarchical, replicate, shard_chains)
from .collectives import (sharded_effective_sample_size, sharded_mean,
                          sharded_nested_rhat,
                          sharded_potential_scale_reduction)
from .sharded import (run_chees_sharded, run_ghmc_sharded,
                      run_hmc_sharded, run_interleaved_sharded,
                      run_nuts_sharded)
