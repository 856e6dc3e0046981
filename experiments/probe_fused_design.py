#!/usr/bin/env python
"""A/B: election88 fused design matmul vs separate per-site takes.

The roofline (PERF.md) pins election88 at its HBM roof with traffic
dominated by the four (chains, cells) take() outputs; folding the four
one-hot lookups + two fixed-effect columns into ONE constant design
matrix (models.zoo.FUSED_DESIGN) turns 4 matmuls + 3 adds (and their
transposes in the gradient) into a single MXU contraction.  This probe
times a 1000-iter scan of fused value_and_grad evaluations at 8192
chains on the real TPU for both formulations (and the plain-gather
control) and prints a table.

    python experiments/probe_fused_design.py [--chains 8192] [--iters 1000]
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
    ap.add_argument("--iters", type=int, default=1000)
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

    cases = [("fused", "matmul", True),
             ("separate-matmul", "matmul", False),
             ("gather", "gather", False)]
    results = {}
    for label, impl, fused in cases:
        zoo.GATHER_IMPL = impl
        zoo.FUSED_DESIGN = fused
        spec = get_model("election88")
        info = get_model_info(spec.model, spec.args)
        pot = make_potential_fn(spec.model, info, spec.args)
        vg = jax.vmap(jax.value_and_grad(pot))

        @jax.jit
        def run(z0):
            def body(z, _):
                u, g = vg(z)
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
        results[label] = per_eval_us
        print(f"[{label:>16s}] dim={info.dim:3d} {per_eval_us:8.1f} "
              f"us/grad-eval (x{args.chains} chains)  wall={wall:.3f}s "
              f"compile={compile_s:.1f}s", flush=True)
    zoo.GATHER_IMPL = "matmul"
    zoo.FUSED_DESIGN = True
    print(f"[          ------] fused is "
          f"{results['separate-matmul'] / results['fused']:.2f}x the "
          f"separate-matmul path, "
          f"{results['gather'] / results['fused']:.2f}x the gather path",
          flush=True)

    out_path = os.path.join(REPO, "results", "probe_fused_design.json")
    with open(out_path, "w") as f:
        json.dump({"chains": args.chains, "iters": args.iters,
                   "us_per_grad_eval": results}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
