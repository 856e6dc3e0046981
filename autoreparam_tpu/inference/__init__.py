from . import (chees, diagnostics, ghmc, hmc, interleaved, nuts,
               pipeline, vi)
from .diagnostics import (effective_sample_size, ess_per_grad,
                          potential_scale_reduction, nested_rhat, summarize,
                          ebfmi, rank_normalize, rhat_rank, ess_bulk,
                          ess_tail,
                          summary_table, format_summary)
from .pipeline import result_summary
from .hmc import HMCConfig, run_hmc, hmc_kernel, warmup_schedule
from .interleaved import run_interleaved_hmc
from .nuts import run_nuts, nuts_kernel
from .pipeline import ExperimentResult, run_experiment
from .vi import (VIResult, discretize_lambda, fit_vi, fit_vi_auto,
                 fit_vip_vi)
from .chees import CheesConfig, run_chees
from .ghmc import GHMCConfig, run_ghmc, ghmc_kernel
from .model_compare import (LooResult, WaicResult, compare, loo,
                            waic)
