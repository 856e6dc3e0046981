from .fused_leapfrog import fused_hmc_kernel, make_fused_leapfrog, pad_dim
