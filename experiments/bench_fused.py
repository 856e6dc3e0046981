#!/usr/bin/env python
"""A/B the Pallas fused-leapfrog HMC kernel vs the XLA scan path on real
TPU.  Prints one JSON line per path.

    python experiments/bench_fused.py [chains] [leapfrog] [funnel|radon]

funnel: synthetic lane-aligned D=128 (the round-1 A/B).  radon: the
flagship model's real potential with one-hot-matmul county lookups —
the roofline (PERF.md) shows its XLA path is dispatch-bound, which is
exactly the overhead a single fused kernel removes.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

from autoreparam_tpu.inference import hmc as H  # noqa: E402
from autoreparam_tpu.ops import fused_hmc_kernel  # noqa: E402


def funnel_potential(dim):
    def pot(z):
        v = z[0]
        x = z[1:]
        return (v ** 2 / 18.0 + 0.5 * jnp.sum(x ** 2) * jnp.exp(-v)
                + (dim - 1) * v / 2.0)
    return pot


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    model = sys.argv[3] if len(sys.argv) > 3 else "funnel"
    if model == "funnel":
        D = 128  # funnel with 127 x-dims: lane-aligned state
        pot = funnel_potential(D)
    else:
        # real-model A/B (the roofline shows radon's XLA path is
        # dispatch-bound: ~a dozen fusions per leapfrog; the fused
        # transition is ONE kernel).  One-hot matmul lowering for the
        # county lookups — in-kernel dynamic gather is not a Pallas
        # TPU-friendly op, the contraction is.
        from autoreparam_tpu.core import get_model_info, make_potential_fn
        from autoreparam_tpu.models import get_model, zoo
        zoo.GATHER_IMPL = "matmul"
        spec = get_model(model, "MN" if model == "radon" else None)
        info = get_model_info(spec.model, spec.args)
        pot = make_potential_fn(spec.model, info, spec.args)
        D = info.dim
    cfg = H.HMCConfig(num_warmup=100, num_samples=200,
                      num_leapfrog_steps=L, init_step_size=0.2)
    key = jax.random.PRNGKey(0)
    init = 0.3 * jax.random.normal(key, (C, D))

    import numpy as np

    def _sync(x):
        # block_until_ready returns early through the axon tunnel; a
        # host fetch is a true sync point.
        jax.block_until_ready(x)
        np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])

    def measure(tag, kernel_impl):
        run = jax.jit(lambda i, k: H.run_hmc(
            pot, i, k, cfg, kernel_impl=kernel_impl))
        k0, k1, k2 = jax.random.split(key, 3)
        t0 = time.perf_counter()
        out = run(init, k0)
        _sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for kk in (k1, k2):
            samples, stats = run(init, kk)
            _sync(samples)
        wall = max((time.perf_counter() - t0) / 2.0, 1e-6)
        steps = (cfg.num_warmup + cfg.num_samples) * L * C
        acc = float(jnp.mean(stats["accept_prob"]))
        print(json.dumps({
            "path": tag,
            "chains": C, "leapfrog": L, "dim": D,
            "steady_s": round(wall, 3),
            "compile_s": round(compile_s - wall, 1),
            "leapfrog_chain_steps_per_sec": round(steps / wall / 1e6, 1),
            "unit": "M steps/s",
            "accept": round(acc, 3),
        }), flush=True)
        return wall

    xla = measure("xla_scan", None)
    fused = measure("pallas_fused",
                    fused_hmc_kernel(pot, L, D, block_chains=512))
    print(json.dumps({"speedup_fused_vs_xla": round(xla / fused, 3)}))


if __name__ == "__main__":
    main()
