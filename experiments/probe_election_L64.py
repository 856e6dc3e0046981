#!/usr/bin/env python
"""election88 L=64 probe (equal gradient budget vs the zoo's L=32 row).

The reference tunes leapfrog steps per model AND per run via its
main.py sweep (SURVEY.md §3.1); the zoo row pins one shared L=32.
This probes whether cVIP's partially-centered geometry prefers the
longer trajectory: L=64 at 2500+1250 steps (same total gradients and
same single-execution length as 5000+2500 x L32 — the axon tunnel
faults on longer single executions, see run_zoo.FULL_OVERRIDES).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from autoreparam_tpu.models import get_model
from autoreparam_tpu.inference import run_experiment
from autoreparam_tpu.utils.results import save_result

OUT = os.path.join(REPO, "results", "election_probe")
spec = get_model("election88")
KW = dict(inference="hmc", num_chains=128, num_warmup=2500,
          num_samples=1250, num_leapfrog_steps=64,
          num_optimization_steps=6000, learning_rate=0.02,
          num_vi_restarts=8)

for method in ("cvip", "ncp"):
    for seed in range(5):
        t0 = time.time()
        try:
            res = run_experiment(spec, method=method, seed=seed, **KW)
            res.summary["total_time_s"] = time.time() - t0
            save_result(OUT, res.summary)
            print(f"[L64] {method} s{seed}: "
                  f"epg={res.summary['ess_per_grad_min']:.1f} "
                  f"rhat={res.summary['rhat_max']:.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"[L64] {method} s{seed}: ERROR {e}", flush=True)
