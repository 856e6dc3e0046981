#!/usr/bin/env python
"""Probe: does the λ-regularization tilt (vi.fit_vi lam_reg) rescue
election88's fragile cVIP seeds?

Round-4 diagnosis (VERDICT r4 next-#1, ZOO_FULL.md note): the cVIP
column's weak seeds die on ONE coordinate each — s4 on log(sigma_age)
(ESS 2686 vs ~27k elsewhere; λ(a_age)≈0.73 partial centering leaves a
residual funnel), s0 on the a_edu block (λ≈0.5).  This grid re-runs the
zoo-full election88 cVIP config across seeds × lam_reg weights (plus
optional sampler-side variants) and writes per-run rows to
results/election_probe/lamreg.json for the promotion decision.

    python experiments/probe_election_lamreg.py [--ws 0.25,0.5] \
        [--seeds 0,1,2,3,4] [--methods cvip] [--extra none]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "results", "election_probe", "lamreg.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ws", default="0.25,0.5")
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--methods", default="cvip")
    ap.add_argument("--extra", default="none",
                    help="comma list of sampler-side variants to add at "
                         "each w: none | ta85 (target_accept=0.85) | "
                         "mass (share_adaptation='mass')")
    ap.add_argument("--keep_band", type=float, default=0.3,
                    help="dvip keep band (dvip rows only)")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
    import numpy as np

    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models import get_model
    from experiments.run_zoo import FULL_OVERRIDES

    spec = get_model("election88")
    base = dict(num_chains=128, num_samples=1000, num_warmup=1500,
                num_leapfrog_steps=16, num_optimization_steps=3000,
                learning_rate=0.05)
    base.update(FULL_OVERRIDES["election88"])

    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = json.load(f)
    done = {(r["method"], r["seed"], r["w"], r["extra"]) for r in rows}

    for method in args.methods.split(","):
        for w in [float(x) for x in args.ws.split(",")]:
            for extra in args.extra.split(","):
                kw = dict(base)
                if extra == "ta85":
                    kw["target_accept"] = 0.85
                elif extra == "ta90":
                    kw["target_accept"] = 0.9
                elif extra == "mass":
                    kw["share_adaptation"] = "mass"
                elif extra == "none":
                    pass
                elif extra == "sharenone":
                    kw["share_adaptation"] = False
                elif extra == "novimass":
                    kw["use_vi_mass"] = False
                elif extra == "noviinit":
                    kw["use_vi_init"] = False
                elif extra == "nomassinit":
                    kw["use_vi_mass"] = False
                    kw["use_vi_init"] = False
                elif extra == "novimass_ta85":
                    kw["use_vi_mass"] = False
                    kw["target_accept"] = 0.85
                elif extra == "novimass_ta65":
                    kw["use_vi_mass"] = False
                    kw["target_accept"] = 0.65
                elif extra == "pilot_novimass":
                    # vip_pilot resolves on (auto-on at this budget);
                    # separate tag so `done` doesn't collide with the
                    # pre-pilot novimass rows
                    kw["use_vi_mass"] = False
                elif extra == "warm10k":
                    kw["num_warmup"] = 10000
                elif extra == "warm10k_ta85":
                    kw["num_warmup"] = 10000
                    kw["target_accept"] = 0.85
                elif extra != "none":
                    raise ValueError(f"unknown extra {extra!r}")
                if method == "dvip":
                    kw["dvip_keep_band"] = args.keep_band
                for seed in [int(s) for s in args.seeds.split(",")]:
                    if (method, seed, w, extra) in done:
                        continue
                    t0 = time.time()
                    res = run_experiment(spec, method=method,
                                         inference="hmc", seed=seed,
                                         lam_reg=w, **kw)
                    s = res.summary
                    lam = {k: [round(float(np.asarray(v).mean()), 3),
                               round(float(np.asarray(v).min()), 3),
                               round(float(np.asarray(v).max()), 3)]
                           for k, v in s.get("lambda", {}).items()}
                    ess = np.asarray(s["ess"])
                    worst = int(np.argmin(ess))
                    row = {
                        "method": method, "seed": seed, "w": w,
                        "extra": extra,
                        "epg": round(s["ess_per_grad_min"], 1),
                        "rhat": round(s["rhat_max"], 3),
                        "ess_min": round(s["ess_min"]),
                        "worst_dim": s["param_names"][worst],
                        "vi_elbo": round(s.get("vi_elbo", float("nan")),
                                         2),
                        "mass_used": s.get("vi_mass_used"),
                        "pilot": s.get("vip_pilot"),
                        "lambda": lam,
                        "wall_s": round(time.time() - t0, 1),
                    }
                    rows.append(row)
                    print(f"[lamreg] {method} s{seed} w={w} "
                          f"extra={extra}: epg={row['epg']} "
                          f"rhat={row['rhat']} worst={row['worst_dim']} "
                          f"({row['wall_s']}s)", flush=True)
                    os.makedirs(os.path.dirname(OUT), exist_ok=True)
                    with open(OUT, "w") as f:
                        json.dump(rows, f, indent=1)
                        f.write("\n")
                    jax.clear_caches()


if __name__ == "__main__":
    main()
