#!/usr/bin/env python
"""Diagnose GHMC's election88 collapse (ENGINES.md: ess_min pinned at
C/2, R-hat 100-700 — chains frozen).

Runs election88-NCP GHMC at reduced budget and prints the adaptation
internals (acceptance, step size, damping) plus A/B over the candidate
causes: init spread (prior-ish vs VI-seeded) and step_scale.

    python experiments/probe_ghmc_election.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass

    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models import get_model

    spec = get_model("election88")
    out = {}
    for label, kw in (
            ("ncp", dict(method="ncp")),
            ("cvip", dict(method="cvip", num_optimization_steps=3000,
                          num_vi_restarts=4)),
    ):
        t0 = time.time()
        res = run_experiment(spec, inference="ghmc",
                             num_chains=128, num_warmup=4000,
                             num_samples=500, ghmc_thin=8, seed=0,
                             **kw)
        s = res.summary
        acc = float(np.asarray(res.stats["accept_prob"]).mean())
        ss = np.asarray(res.stats["step_size"])
        mult = np.asarray(res.stats["step_mult"])
        rec = {"ess_min": float(s["ess_min"]),
               "epg": float(s["ess_per_grad_min"]),
               "rhat": float(s["rhat_max"]),
               "accept_mean": acc,
               "step_size_median": float(np.median(ss)),
               "step_mult_median": float(np.median(mult)),
               "step_mult_max": float(mult.max()),
               "wall_s": round(time.time() - t0, 1)}
        out[label] = rec
        print(f"[ghmc {label}] {rec}", flush=True)
        jax.clear_caches()

    with open(os.path.join(REPO, "results", "probe_ghmc_election.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/probe_ghmc_election.json")


if __name__ == "__main__":
    main()
