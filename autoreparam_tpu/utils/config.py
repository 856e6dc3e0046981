"""ml_collections ConfigDict presets (SURVEY.md §6 "Config / flag
system": ConfigDict + a thin absl CLI mirroring the reference's
vocabulary — the CLI lives in cli/main.py; these are the programmatic
presets).

    from autoreparam_tpu.utils.config import get_config
    cfg = get_config("radon")          # tuned defaults for the model
    cfg.method = "cvip"
    res = run_from_config(cfg)
"""

from __future__ import annotations

import ml_collections


def base_config() -> ml_collections.ConfigDict:
    c = ml_collections.ConfigDict()
    c.model = "eight_schools"
    c.dataset = ""
    c.method = "cp"            # cp | ncp | cvip | dvip | interleaved
    c.inference = "hmc"        # hmc | nuts | chees | vi
    c.num_chains = 128
    c.num_warmup = 1000
    c.num_samples = 1000
    c.num_leapfrog_steps = 16
    c.max_tree_depth = 8
    c.num_optimization_steps = 3000
    c.num_mc_samples = 8
    c.learning_rate = 0.02
    c.target_accept = 0.75
    c.seed = 0
    c.shard = False
    # "auto": pooled cross-chain warmup, except mass-only pooling on the
    # multi-basin german posteriors (pipeline.MASS_ONLY_POOLING)
    c.share_adaptation = "auto"
    c.results_dir = "./results"
    return c


# per-model tuned overrides (sampler geometry differs per model family;
# the german posteriors need the large budgets to converge at all —
# R-hat trend 1.47@5k -> 1.17@15k warmup for ANY method)
_PRESETS = {
    "eight_schools": dict(num_leapfrog_steps=16),
    "neals_funnel": dict(num_leapfrog_steps=8),
    "radon": dict(dataset="MN", learning_rate=0.05),
    "german_credit_lognormalcentered": dict(
        num_warmup=30000, num_samples=10000, num_leapfrog_steps=16,
        num_optimization_steps=5000, method="interleaved"),
    "german_credit_gammascale": dict(num_warmup=30000, num_samples=10000,
                                     num_optimization_steps=5000),
    "election88": dict(inference="nuts", max_tree_depth=6,
                       num_chains=8192, num_warmup=300, num_samples=300),
    "electric": dict(num_leapfrog_steps=8),
}


def get_config(model: str = "eight_schools") -> ml_collections.ConfigDict:
    c = base_config()
    c.model = model
    for k, v in _PRESETS.get(model, {}).items():
        setattr(c, k, v)
    return c


def run_from_config(c: ml_collections.ConfigDict):
    from ..inference.pipeline import run_experiment
    from ..models import get_model

    spec = get_model(c.model, c.dataset or None)
    return run_experiment(
        spec, method=c.method, inference=c.inference,
        num_chains=c.num_chains, num_warmup=c.num_warmup,
        num_samples=c.num_samples,
        num_leapfrog_steps=c.num_leapfrog_steps,
        max_tree_depth=c.max_tree_depth,
        num_optimization_steps=c.num_optimization_steps,
        num_mc_samples=c.num_mc_samples,
        learning_rate=c.learning_rate,
        target_accept=c.target_accept,
        seed=c.seed, shard=c.shard,
        share_adaptation=(None if c.share_adaptation == "auto"
                          else c.share_adaptation))
