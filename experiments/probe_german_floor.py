#!/usr/bin/env python
"""Probe: raise the german_credit_lognormalcentered convergence floor
(VERDICT r4 next-#4: worst seed R-hat <= 1.05 for every converged cell,
cvip >= cp by a clear margin) and pin the iHMC "reversal" root cause
(next-#3) with extra seeds.

Variants per method over seeds:
  base      — the zoo FULL_OVERRIDES config as committed
  warm30k   — num_warmup=30000 (gammascale's budget; warmup is free in
              the ess/grad metric, the question is whether the extra
              adaptation buys R-hat margin)
  ta85      — target_accept=0.85 (smaller steps on the sigma=10
              log-scale funnels)
  ghmcthin  — inference='ghmc' at a gradient-matched thin (the MEADS
              ensemble kernel; 1 grad/sweep)

    python experiments/probe_german_floor.py --methods cvip,cp \
        --seeds 0,1,2,3,4 --variants base,warm30k
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "results", "german_probe", "floor.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="cvip,cp")
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--variants", default="warm30k")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
    import numpy as np

    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models import get_model
    from experiments.run_zoo import FULL_OVERRIDES

    spec = get_model("german_credit_lognormalcentered")
    base = dict(num_chains=128, num_samples=1000, num_warmup=1500,
                num_leapfrog_steps=16, num_optimization_steps=3000,
                learning_rate=0.05)
    base.update(FULL_OVERRIDES["german_credit_lognormalcentered"])

    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = json.load(f)
    done = {(r["method"], r["seed"], r["variant"]) for r in rows}

    for variant in args.variants.split(","):
        for method in args.methods.split(","):
            kw = dict(base)
            inference = "hmc"
            if variant == "warm30k":
                kw["num_warmup"] = 30000
            elif variant == "s10k":
                kw["num_samples"] = 10000
            elif variant == "s15k":
                kw["num_samples"] = 15000
            elif variant == "ta85":
                kw["target_accept"] = 0.85
            elif variant == "ghmcthin":
                inference = "ghmc"
                # gradient-match: L=32 HMC costs 32 grads/sample
                kw["ghmc_thin"] = 32
            elif variant != "base":
                raise ValueError(f"unknown variant {variant!r}")
            for seed in [int(s) for s in args.seeds.split(",")]:
                if (method, seed, variant) in done:
                    continue
                t0 = time.time()
                res = run_experiment(spec, method=method,
                                     inference=inference, seed=seed,
                                     **kw)
                s = res.summary
                ess = np.asarray(s["ess"])
                worst = int(np.argmin(ess))
                row = {
                    "method": method, "seed": seed, "variant": variant,
                    "epg": round(s["ess_per_grad_min"], 2),
                    "rhat": round(s["rhat_max"], 3),
                    "ess_min": round(s["ess_min"]),
                    "worst_dim": s["param_names"][worst],
                    "wall_s": round(time.time() - t0, 1),
                }
                rows.append(row)
                print(f"[floor] {method} s{seed} {variant}: "
                      f"epg={row['epg']} rhat={row['rhat']} "
                      f"worst={row['worst_dim']} ({row['wall_s']}s)",
                      flush=True)
                os.makedirs(os.path.dirname(OUT), exist_ok=True)
                with open(OUT, "w") as f:
                    json.dump(rows, f, indent=1)
                    f.write("\n")
                jax.clear_caches()


if __name__ == "__main__":
    main()
