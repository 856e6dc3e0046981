#!/usr/bin/env python
"""election88 dense-metric probe: does a dense (89x89) inverse mass fix
the diagnosed cVIP-vs-NCP gap?

The zoo-note diagnosis (ZOO_FULL.md, results/election_probe/lamreg.json)
is that cVIP's residual gap to NCP is *structural under the diagonal
metric*: the ELBO centers data-rich states, centered states correlate
with their regression parents (mua, a_region, b_v_prev), and diagonal-
mass HMC pays that correlation as ~2x slower mixing.  A dense metric
removes exactly that cost.  This probe runs the zoo-budget election88
cells with mass_structure='dense' for the methods the invariant
compares (cvip, ncp, cp, dvip), seeds configurable.

    python experiments/probe_election_dense.py [--methods=...] \
        [--seeds=...] [--results_dir=results/election_probe/dense]
"""

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# mirror experiments/run_zoo.py FULL_OVERRIDES["election88"] exactly,
# so the only delta vs the committed zoo cells is the metric
ZOO_BUDGET = dict(num_chains=128, num_warmup=5000, num_samples=2500,
                  num_optimization_steps=6000,
                  learning_rate=0.02, num_vi_restarts=8,
                  use_vi_mass=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="cvip,ncp,cp,dvip")
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--results_dir",
                    default=os.path.join(REPO, "results",
                                         "election_probe", "dense"))
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass

    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models import get_model
    from autoreparam_tpu.utils.results import save_result

    spec = get_model("election88", None)
    for method in args.methods.split(","):
        for seed in [int(s) for s in args.seeds.split(",")]:
            t0 = time.time()
            tag = f"election88 x {method} s{seed} dense"
            try:
                res = run_experiment(spec, method=method,
                                     inference="hmc", seed=seed,
                                     mass_structure="dense",
                                     num_leapfrog_steps=args.L,
                                     **ZOO_BUDGET)
                res.summary["total_time_s"] = time.time() - t0
                save_result(args.results_dir, res.summary)
                print(f"[dense] {tag}: ess/grad(min)="
                      f"{res.summary['ess_per_grad_min']:.3f} "
                      f"rhat={res.summary['rhat_max']:.3f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
            except Exception:
                print(f"[dense] {tag}: ERROR", flush=True)
                traceback.print_exc()
            jax.clear_caches()


if __name__ == "__main__":
    main()
