#!/usr/bin/env python
"""Chain-scaling curve on one chip: ESS/sec vs number of chains.

    python experiments/scaling.py [--chains 256,1024,4096,8192,16384]

The chain axis is this framework's scaling axis (docs/DESIGN.md §2);
this measures how far one chip rides it before HBM/VPU saturate.
Writes results/scaling.json and prints one JSON line per point.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", default="256,1024,4096,8192,16384")
    ap.add_argument("--out", default=os.path.join(REPO, "results",
                                                  "scaling.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass

    from autoreparam_tpu.core import get_model_info, make_potential_fn
    from autoreparam_tpu.inference import hmc as H
    from autoreparam_tpu.inference import diagnostics as dg
    from autoreparam_tpu.models import get_model
    from autoreparam_tpu.reparam import make_vip_model
    from autoreparam_tpu.reparam.handler import eligible_sites

    spec = get_model("radon", "MN")
    sites = eligible_sites(spec.model, spec.args)
    lam0 = {s: jnp.full(sh, 0.35) for s, sh in sites.items()}
    info = get_model_info(make_vip_model(spec.model, lam0), spec.args)
    cfg = H.HMCConfig(num_warmup=500, num_samples=500,
                      num_leapfrog_steps=16)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(i, k, lam):
        pot = make_potential_fn(make_vip_model(spec.model, lam), info,
                                spec.args)
        return H.run_hmc(pot, i, k, cfg)

    def _sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])

    points = []
    for C in [int(x) for x in args.chains.split(",")]:
        init = 0.1 * jax.random.normal(key, (C, info.dim))
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, C), 3)
        t0 = time.perf_counter()
        out = run(init, k1, lam0)
        _sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        samples, stats = run(init, k2, lam0)
        _sync(samples)
        samples, stats = run(init, k3, lam0)
        _sync(samples)
        wall = (time.perf_counter() - t0) / 2.0
        sub = min(1024, C)
        ess = np.asarray(dg.effective_sample_size(
            samples[:, :sub], max_lags=256)) * (C / sub)
        steps = (cfg.num_warmup + cfg.num_samples) * 16 * C
        point = {
            "chains": C,
            "wall_s": round(wall, 3),
            "compile_s": round(compile_s - wall, 1),
            "ess_min_per_sec": round(float(ess.min() / wall), 1),
            "M_leapfrog_chain_steps_per_sec": round(steps / wall / 1e6,
                                                    1),
            "timestamp": time.time(),
        }
        points.append(point)
        print(json.dumps(point), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(points, f, indent=1)


if __name__ == "__main__":
    main()
