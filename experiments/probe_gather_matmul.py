#!/usr/bin/env python
"""A/B: per-group effect lookups as batched gather vs one-hot MXU matmul.

ROADMAP "Profile the radon gradient ... gather -> one-hot matmul on MXU
may win at 8k chains".  The HMC hot loop evaluates grad(U) 2L times per
transition; on the gather path that gradient contains a scatter-add over
the group axis per chain.  This probe times a scan of K fused
value_and_grad evaluations at 8192 chains on the real TPU for both
lowerings (models.zoo.GATHER_IMPL) and prints a table.

    python experiments/probe_gather_matmul.py [--chains 8192] [--iters 200]
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
    ap.add_argument("--chains", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--models", default="radon,election88,electric")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from autoreparam_tpu.core import get_model_info, make_potential_fn
    from autoreparam_tpu.models import get_model, zoo

    def _sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.tree.leaves(x)[0][(0,) * jax.tree.leaves(x)[0].ndim])

    results = {}
    for model_name in args.models.split(","):
        dataset = "MN" if model_name == "radon" else None
        for impl in ("gather", "matmul", "auto"):
            zoo.GATHER_IMPL = impl
            spec = get_model(model_name, dataset)
            info = get_model_info(spec.model, spec.args)
            pot = make_potential_fn(spec.model, info, spec.args)
            vg = jax.vmap(jax.value_and_grad(pot))

            @jax.jit
            def run(z0):
                def body(z, _):
                    u, g = vg(z)
                    # data dependence so the scan cannot collapse
                    return z - 1e-9 * g, u
                z, us = jax.lax.scan(body, z0, None, length=args.iters)
                return z, us

            z0 = 0.1 * jax.random.normal(
                jax.random.PRNGKey(0), (args.chains, info.dim), jnp.float32)
            t0 = time.perf_counter()
            out = run(z0)
            _sync(out)
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(z0)
                _sync(out)
                walls.append(time.perf_counter() - t0)
            wall = min(walls)
            per_eval_us = wall / args.iters * 1e6
            results[(model_name, impl)] = per_eval_us
            print(f"[{model_name:>10s} {impl:>6s}] dim={info.dim:3d} "
                  f"{per_eval_us:8.1f} us/grad-eval (x{args.chains} chains)"
                  f"  wall={wall:.3f}s  compile={compile_s:.1f}s",
                  flush=True)
        g, m = results[(model_name, "gather")], results[(model_name, "matmul")]
        a = results[(model_name, "auto")]
        print(f"[{model_name:>10s}  -----] matmul is {g / m:.2f}x, "
              f"auto is {g / a:.2f}x the gather path", flush=True)

    out_path = os.path.join(REPO, "results", "probe_gather_matmul.json")
    with open(out_path, "w") as f:
        json.dump({f"{m}/{i}": v for (m, i), v in results.items()}, f,
                  indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
