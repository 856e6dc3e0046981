#!/usr/bin/env python
"""Probe BASELINE config 5 variants: election88, 8192-chain sharded NUTS.

Round-2 FAIL was R-hat 1.072-1.078 (ncp, 300/800 warmup, pre-mitigation
run_nuts).  This probe compares the candidate fixes from VERDICT.md task
1/2 — sampling-phase step jitter (now default), share_adaptation="mass",
longer warmup, and the cvip method — so run_parity.py can pin the
winning recipe.

    python experiments/probe_config5.py --variants jitter,mass,cvip
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = {
    # name -> (method, kwargs)
    "jitter": ("ncp", {}),                       # run_nuts default jitter=0.2
    "mass": ("ncp", dict(share_adaptation="mass")),
    "warm1600": ("ncp", dict(num_warmup=1600)),
    "cvip": ("cvip", {}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="jitter,mass,cvip")
    ap.add_argument("--chains", type=int, default=8192)
    ap.add_argument("--warmup", type=int, default=800)
    ap.add_argument("--samples", type=int, default=300)
    ap.add_argument("--shard", action="store_true",
                    help="wrap in the mesh-sharded runner (a different "
                    "HLO; run_parity config 5 runs unsharded on the "
                    "single chip — the 1-device mesh is trivial)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models import get_model
    from autoreparam_tpu.utils.results import save_result

    spec = get_model("election88")
    for name in args.variants.split(","):
        method, kw = VARIANTS[name]
        base = dict(num_chains=args.chains, num_warmup=args.warmup,
                    num_samples=args.samples, max_tree_depth=6,
                    shard=args.shard, seed=0)
        base.update(kw)
        t0 = time.time()
        try:
            res = run_experiment(spec, method=method, inference="nuts",
                                 **base)
            s = res.summary
            s["probe_variant"] = name
            save_result(os.path.join(REPO, "results", "probe_config5"),
                        s)
            print(f"[c5 {name}] rhat={s['rhat_max']:.3f} "
                  f"ess_min={s['ess_min']:.0f} "
                  f"wall={s['wall_time_s']:.1f}s "
                  f"total={time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"[c5 {name}] ERROR {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
