#!/usr/bin/env python
"""A/B: leapfrog scan unroll factor (inference.hmc.LEAPFROG_UNROLL).

PERF.md's roofline attributes the residual gap between achieved and
floor HBM bandwidth on radon-MN to per-fusion dispatch latency across
the ~dozen kernels of each leapfrog step.  Unrolling the leapfrog
`lax.scan` lets XLA fuse across step boundaries, which would amortize
that fixed cost — IF the step-boundary elementwise ops are actually
what's left (the gradient evaluation itself cannot fuse across steps).
This probe times a scan of K full HMC transitions (refresh + L
leapfrogs + accept, the same composition as the bench hot loop) at 8192
chains on the real TPU for unroll in {1, 2, 4, 8} and prints a table.

    python experiments/probe_unroll.py [--chains 8192] [--iters 50] [--L 16]
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
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--L", type=int, default=16)
    ap.add_argument("--unrolls", default="1,2,4,8")
    ap.add_argument("--models", default="radon,funnel128")
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
    from autoreparam_tpu.inference import hmc as hmc_mod
    from autoreparam_tpu.models import get_model

    def _sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.tree.leaves(x)[0][(0,) * jax.tree.leaves(x)[0].ndim])

    def make_pot(model_name):
        if model_name == "funnel128":
            def pot(z):
                v, x = z[0], z[1:]
                return (0.5 * (v / 3.0) ** 2
                        + 0.5 * jnp.sum(x * x) * jnp.exp(-v)
                        + 0.5 * (z.shape[0] - 1) * v)
            return pot, 128
        dataset = "MN" if model_name == "radon" else None
        spec = get_model(model_name, dataset)
        info = get_model_info(spec.model, spec.args)
        return make_potential_fn(spec.model, info, spec.args), info.dim

    results = {}
    for model_name in args.models.split(","):
        pot, dim = make_pot(model_name)
        per_unroll = {}
        for unroll in [int(u) for u in args.unrolls.split(",")]:
            hmc_mod.LEAPFROG_UNROLL = unroll
            kernel = hmc_mod.hmc_kernel(pot, num_leapfrog_steps=args.L)
            vkernel = jax.vmap(kernel, in_axes=(0, 0, None, None))

            @jax.jit
            def run(z0, key, eps, inv_mass):
                def init(z):
                    u, g = jax.value_and_grad(pot)(z)
                    return hmc_mod.HMCState(z=z, pot=u, grad=g)
                state0 = jax.vmap(init)(z0)

                def body(state, k):
                    ks = jax.random.split(k, z0.shape[0])
                    state, info = vkernel(state, ks, eps, inv_mass)
                    return state, info.accept_prob
                keys = jax.random.split(key, args.iters)
                state, acc = jax.lax.scan(body, state0, keys)
                return state.z, acc

            z0 = 0.1 * jax.random.normal(
                jax.random.PRNGKey(0), (args.chains, dim), jnp.float32)
            eps = jnp.float32(0.05)
            inv_mass = jnp.ones((dim,), jnp.float32)
            t0 = time.perf_counter()
            out = run(z0, jax.random.PRNGKey(1), eps, inv_mass)
            _sync(out)
            compile_s = time.perf_counter() - t0
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(z0, jax.random.PRNGKey(1), eps, inv_mass)
                _sync(out)
                walls.append(time.perf_counter() - t0)
            wall = min(walls)
            mlcs = args.chains * args.iters * args.L / wall / 1e6
            per_unroll[unroll] = mlcs
            results[f"{model_name}/unroll{unroll}"] = mlcs
            print(f"[{model_name:>10s} unroll={unroll}] dim={dim:3d} "
                  f"{mlcs:7.1f} M lcs/s  wall={wall:.3f}s "
                  f"compile={compile_s:.1f}s", flush=True)
        base = per_unroll.get(1)
        if base:
            best_u = max(per_unroll, key=per_unroll.get)
            print(f"[{model_name:>10s}  -----] best unroll={best_u} at "
                  f"{per_unroll[best_u] / base:.3f}x of unroll=1", flush=True)

    out_path = os.path.join(REPO, "results", "probe_unroll.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
