#!/usr/bin/env python
"""Roofline / MFU accounting for the HMC hot loop (VERDICT r3 task 3).

"Fast vs a CPU strawman" is not "fast vs the chip": this probe relates
measured throughput to the hardware's compute and HBM-bandwidth peaks.
For radon-MN and election88 it

1. compiles ONE full HMC transition (momentum refresh + L leapfrogs +
   MH accept, vmapped over the chain batch) with the leapfrog
   PYTHON-UNROLLED and reads XLA's `cost_analysis()` — flops and HBM
   bytes accessed of the optimized HLO.  The unroll matters: XLA's
   cost analysis counts a while-loop body ONCE regardless of trip
   count (measured here), so any scanned program under-reports; a
   loop-free HLO's counts are exact (verified against a matmul's 2MNK);
2. measures steady-state transitions/s with a fetch-synced scan;
3. reports achieved FLOP/s and bytes/s as fractions of the chip peaks,
   naming the binding resource.

TPU v5e (this box's chip) public peaks: 197 TFLOP/s bf16 MXU,
819 GB/s HBM.  The sampler state is f32 and the models are ~100-dim
elementwise work + tiny gathers, i.e. arithmetic intensity well under
1 FLOP/byte — the relevant ceiling is HBM bandwidth, and the MXU peak
is quoted only to show how far from compute-bound this workload is.

    python experiments/roofline.py [--chains 8192] [--steps 64] [--iters 200]

Writes results/roofline.json (consumed by experiments/make_perf.py).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=8,
                    help="leapfrog steps per transition (L)")
    ap.add_argument("--iters", type=int, default=200,
                    help="transitions per timed scan")
    ap.add_argument("--models", default="radon,election88")
    ap.add_argument("--out", default=os.path.join(REPO, "results",
                                                  "roofline.json"))
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
    from autoreparam_tpu.models import get_model

    def _sync(x):
        leaf = jax.tree.leaves(x)[0]
        jax.block_until_ready(leaf)
        np.asarray(leaf[(0,) * leaf.ndim])

    out = {"chains": args.chains, "leapfrog_steps": args.steps,
           "backend": jax.default_backend(),
           "peaks": {"bf16_flops": V5E_PEAK_BF16_FLOPS,
                     "hbm_bytes_per_s": V5E_PEAK_HBM_BYTES},
           "models": {}}

    for model_name in args.models.split(","):
        dataset = "MN" if model_name == "radon" else None
        spec = get_model(model_name, dataset)
        info = get_model_info(spec.model, spec.args)
        pot = make_potential_fn(spec.model, info, spec.args)
        kernel = jax.vmap(H.hmc_kernel(pot, args.steps),
                          in_axes=(0, 0, 0, 0))
        C, D = args.chains, info.dim
        pg = jax.vmap(jax.value_and_grad(pot))

        def run(z0, key):
            pot0, grad0 = pg(z0)
            st = H.HMCState(z0, pot0, grad0)
            ss = jnp.full((C,), 0.05, jnp.float32)
            im = jnp.ones((C, D), jnp.float32)

            def body(st, k):
                st, info_ = kernel(st, jax.random.split(k, C), ss, im)
                return st, info_.accept_prob

            st, acc = jax.lax.scan(body, st,
                                   jax.random.split(key, args.iters))
            return st.z, acc

        z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (C, D),
                                     jnp.float32)
        key = jax.random.PRNGKey(1)
        lowered = jax.jit(run).lower(z0, key)
        compiled = lowered.compile()

        # XLA's cost_analysis counts a while-loop BODY ONCE, ignoring
        # trip count (measured on this box: scan length 1/10/100 over a
        # matmul body all report identical flops), so the scanned `run`
        # above cannot be used for cost accounting.  Instead compile a
        # single transition with the leapfrog Python-unrolled — the
        # resulting HLO has no loops, and cost_analysis of a loop-free
        # program is exact (verified against the analytic 2MNK of a
        # plain matmul).  Same math as inference.hmc.hmc_kernel.
        def one_transition(z, pot0, grad, key, ss, im):
            key_mom, key_acc = jax.random.split(key)
            r = (jax.random.normal(key_mom, z.shape, z.dtype)
                 * jax.lax.rsqrt(im))
            e0 = pot0 + 0.5 * jnp.sum(r * r * im)
            zz, gg, pot_new = z, grad, pot0
            for _ in range(args.steps):           # Python-unrolled
                r_half = r - 0.5 * ss * gg
                zz = zz + ss * im * r_half
                pot_new, gg = jax.value_and_grad(pot)(zz)
                r = r_half - 0.5 * ss * gg
            e1 = pot_new + 0.5 * jnp.sum(r * r * im)
            delta = e0 - e1
            accept = (jax.random.uniform(key_acc, (), z.dtype)
                      < jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0))))
            return jnp.where(accept, zz, z), jnp.where(accept, e1, e0)

        ss0 = jnp.full((C,), 0.05, jnp.float32)
        im0 = jnp.ones((C, D), jnp.float32)
        pot0, grad0 = jax.jit(pg)(z0)
        cost_compiled = jax.jit(jax.vmap(one_transition)).lower(
            z0, pot0, grad0, jax.random.split(key, C), ss0, im0).compile()
        ca = cost_compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        # per-transition counts -> totals for the timed scan's work
        flops_total = float(ca.get("flops", float("nan"))) * args.iters
        bytes_total = float(ca.get("bytes accessed",
                                   ca.get("bytes_accessed",
                                          float("nan")))) * args.iters
        # analytic HBM floor: a perfectly-fused leapfrog still reads
        # (z, r, grad, inv_mass) and writes (z, r, grad) per step
        bytes_floor_per_lcs = 7 * D * 4

        t0 = time.perf_counter()
        outv = compiled(z0, key)
        _sync(outv)
        compile_probe_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            outv = compiled(z0, key)
            _sync(outv)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)

        transitions = args.iters
        lcs = transitions * args.steps * C  # leapfrog-chain-steps
        flops_per_lcs = flops_total / lcs
        bytes_per_lcs = bytes_total / lcs
        achieved_flops = flops_total / wall
        achieved_bytes = bytes_total / wall
        frac_flops = achieved_flops / V5E_PEAK_BF16_FLOPS
        frac_bw = achieved_bytes / V5E_PEAK_HBM_BYTES
        intensity = flops_total / bytes_total
        binding = "HBM bandwidth" if frac_bw >= frac_flops else "compute"
        row = {
            "dim": D,
            "flops_per_leapfrog_chain_step": flops_per_lcs,
            "bytes_per_leapfrog_chain_step": bytes_per_lcs,
            "bytes_floor_per_leapfrog_chain_step": bytes_floor_per_lcs,
            "arithmetic_intensity_flops_per_byte": intensity,
            "wall_s": wall,
            "first_run_s": compile_probe_s,
            "M_leapfrog_chain_steps_per_s": lcs / wall / 1e6,
            "achieved_tflops": achieved_flops / 1e12,
            "achieved_GBps": achieved_bytes / 1e9,
            "frac_of_bf16_peak": frac_flops,
            "frac_of_hbm_peak": frac_bw,
            "binding_resource": binding,
        }
        out["models"][spec.name] = row
        print(f"[{spec.name}] D={D} "
              f"{row['M_leapfrog_chain_steps_per_s']:.0f}M lcs/s  "
              f"{flops_per_lcs:.0f} flops/lcs {bytes_per_lcs:.0f} B/lcs  "
              f"AI={intensity:.3f}  achieved {row['achieved_GBps']:.0f} "
              f"GB/s ({100 * frac_bw:.1f}% of HBM peak), "
              f"{row['achieved_tflops']:.2f} TFLOP/s "
              f"({100 * frac_flops:.2f}% of bf16 peak) -> {binding}",
              flush=True)
        jax.clear_caches()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
