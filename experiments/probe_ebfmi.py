#!/usr/bin/env python
"""Diagnose the flagship bench's E-BFMI (VERDICT r3 task 2).

BENCH_r03 reported ebfmi_min 0.196 — below the 0.3 heavy-tail/funnel
bar the framework's own docs cite — unremarked.  This probe runs the
bench pipeline (radon-MN cVIP + ChEES) with and without the Gaussian
tail transport on the HalfCauchy sigma-sites and reports, for each:

- the per-chain E-BFMI DISTRIBUTION (min over 8192 noisy per-chain
  estimates is an extreme-value statistic; the quantiles say whether
  the min is a tail artifact or the typical chain is sick);
- per-coordinate |corr(z_d, energy)| (pooled over chains, median) —
  which coordinates the energy rides on (Stan's divergence-style
  attribution, applied to E-BFMI);
- min ess/grad + R-hat, so the transport's mixing effect is measured
  at bench scale, not just the CPU smoke numbers.

    python experiments/probe_ebfmi.py [--chains 2048] [--samples 1000]

Writes results/probe_ebfmi.json.
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
    ap.add_argument("--chains", type=int, default=2048)
    ap.add_argument("--warmup", type=int, default=250)
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--vi_steps", type=int, default=1500)
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "probe_ebfmi.json"))
    args = ap.parse_args()

    import jax
    import numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass

    from autoreparam_tpu.inference import diagnostics as dg
    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models import get_model

    spec = get_model("radon", "MN")
    out = {"chains": args.chains, "samples": args.samples,
           "backend": jax.default_backend(), "cases": {}}

    for tt in (False, True):
        t0 = time.time()
        res = run_experiment(spec, method="cvip", inference="chees",
                             num_chains=args.chains,
                             num_warmup=args.warmup,
                             num_samples=args.samples,
                             num_optimization_steps=args.vi_steps,
                             learning_rate=0.05, seed=0,
                             tail_transport=tt,
                             chees_criterion="snaper_rate")
        s = res.summary
        energy = np.asarray(res.stats["energy"])          # (S, C)
        eb = np.asarray(dg.ebfmi(res.stats["energy"]))    # (C,)
        qs = np.percentile(eb, [0, 1, 5, 25, 50, 75, 100])
        # per-coordinate energy attribution: median-over-chains
        # |corr(z_d, H)| on the collected model-space samples
        if isinstance(res.samples, dict):
            from autoreparam_tpu.inference.pipeline import \
                flatten_site_samples
            flat, _ = flatten_site_samples(res.samples)
            arr = np.asarray(flat)
        else:
            arr = np.asarray(res.samples)
        corr = {}
        if arr is not None:
            S, C, D = arr.shape
            e = energy - energy.mean(0)                   # (S, C)
            x = arr - arr.mean(0)                         # (S, C, D)
            num = np.einsum("sc,scd->cd", e, x) / S
            den = (e.std(0)[:, None] * x.std(0) + 1e-12)
            r = np.abs(num / den)                         # (C, D)
            med = np.median(r, axis=0)
            names = s["param_names"]
            order = np.argsort(-med)[:8]
            corr = {names[i]: round(float(med[i]), 3) for i in order}
        out["cases"]["transport" if tt else "baseline"] = {
            "ebfmi_min": float(qs[0]),
            "ebfmi_quantiles_0_1_5_25_50_75_100": [round(float(v), 4)
                                                   for v in qs],
            "frac_chains_below_0.3": float((eb < 0.3).mean()),
            "ess_per_grad_min": s["ess_per_grad_min"],
            "ess_min": s["ess_min"],
            "rhat_max": s["rhat_max"],
            "top_energy_correlated_dims": corr,
            "lambda_mean": {k: float(np.asarray(v).mean())
                            for k, v in (s.get("lambda") or {}).items()},
            "wall_total_s": round(time.time() - t0, 1),
        }
        print(f"[ebfmi tt={tt}] min={qs[0]:.3f} "
              f"q=[{', '.join(f'{v:.3f}' for v in qs)}] "
              f"frac<0.3={(eb < 0.3).mean():.3f} "
              f"epg={s['ess_per_grad_min']:.1f} rhat={s['rhat_max']:.3f}",
              flush=True)
        print(f"  top energy-correlated dims: {corr}", flush=True)
        jax.clear_caches()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
