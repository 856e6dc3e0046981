#!/usr/bin/env python
"""Probe: does the Gaussian tail transport (reparam.TailTransport) move
election88?  Its five HalfCauchy scale sites are exactly the family the
transport rewrites, and the committed dVIP failures die on
log(sigma_edu).  Runs {ncp, cvip} x {transport off, on} at the zoo
full budget (no vi_rank — mixed evidence) and reports ess/grad.

    python experiments/probe_election_transport.py [--seeds 0,1]

Writes results/election_probe/transport.json.
"""

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--methods", default="ncp,cvip")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "election_probe", "transport.json"))
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

    spec = get_model("election88")
    size = dict(num_chains=16 if args.quick else 128,
                num_warmup=500 if args.quick else 5000,
                num_samples=500 if args.quick else 2500,
                num_leapfrog_steps=32,
                num_optimization_steps=800 if args.quick else 6000,
                learning_rate=0.02,
                num_vi_restarts=8)

    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    for method in args.methods.split(","):
        for tt in (False, True):
            for seed in [int(s) for s in args.seeds.split(",")]:
                tag = f"{method}/{'tt' if tt else 'base'}/s{seed}"
                t0 = time.time()
                try:
                    res = run_experiment(spec, method=method,
                                         inference="hmc", seed=seed,
                                         tail_transport=tt, **size)
                    s = res.summary
                    out[tag] = {
                        "ess_per_grad_min": s["ess_per_grad_min"],
                        "rhat_max": s["rhat_max"],
                        "ebfmi_min": s.get("ebfmi_min"),
                        "vi_elbo": s.get("vi_elbo"),
                        "vi_is_ess_frac": s.get("vi_is_ess_frac"),
                        "wall_s": time.time() - t0,
                    }
                    print(f"[{tag}] epg={s['ess_per_grad_min']:.1f} "
                          f"rhat={s['rhat_max']:.3f} "
                          f"ebfmi={s.get('ebfmi_min')} "
                          f"({time.time()-t0:.0f}s)", flush=True)
                except Exception:
                    print(f"[{tag}] ERROR", flush=True)
                    traceback.print_exc()
                jax.clear_caches()
                os.makedirs(os.path.dirname(args.out), exist_ok=True)
                with open(args.out, "w") as f:
                    json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
