#!/usr/bin/env python
"""Probe: does low-rank-plus-diagonal q (vi_rank > 0) lift election88
cVIP past NCP?

ZOO_FULL.md documents the one open exception to the paper's invariant:
election88 cVIP reaches ~0.73x NCP's converged-seed median min-ESS/grad
(295 vs 404).  Every earlier lead (longer/cooler VI, overdispersed
init, L sweeps, VI restarts, lambda tying, mass gating, L=64) was
probed and rejected — see ZOO_FULL.md footnote.  The untried lever is
q itself: the 89-dim posterior (51 state effects x demographic
coefficients) is correlated, mean-field q* underestimates marginals,
and both the init spread and the q*^2 mass seed inherit that bias.
vi_rank=r lets q carry the top-r covariance directions
(inference/vi.py q_rank), feeding HMC a better init and mass.

    python experiments/probe_election_rank.py --ranks 0,8 --seeds 0,1
    python experiments/probe_election_rank.py --full   # zoo-sized

Writes one JSON per run to results/election_probe/ (config-hash names,
same dir as the earlier probes) and prints a comparison table.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ranks", default="0,8")
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--full", action="store_true",
                    help="zoo-full budget (5000/2500, L=32); default is "
                         "a half-budget CPU probe (2000/1000, L=32)")
    ap.add_argument("--method", default="cvip", choices=["cvip", "dvip"],
                    help="which VI-consuming method to sweep over ranks "
                         "(cp/ncp never fit VI, so rank is a no-op there)")
    ap.add_argument("--include_ncp", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="--no-include_ncp skips the per-seed NCP "
                         "baseline leg")
    ap.add_argument("--results_dir",
                    default=os.path.join(REPO, "results/election_probe"))
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend; default pins CPU "
                         "BEFORE any device query (jax.default_backend() "
                         "initializes the backend, which hangs for "
                         "minutes when the axon tunnel is down)")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models import get_model
    from autoreparam_tpu.utils.results import save_result

    spec = get_model("election88")
    budget = (dict(num_warmup=5000, num_samples=2500) if args.full
              else dict(num_warmup=2000, num_samples=1000))
    base = dict(inference="hmc", num_chains=128, num_leapfrog_steps=32,
                num_optimization_steps=6000, num_vi_restarts=8,
                learning_rate=0.01, **budget)

    rows = []
    seeds = [int(s) for s in args.seeds.split(",")]
    for seed in seeds:
        for rank in [int(r) for r in args.ranks.split(",")]:
            res = run_experiment(spec, method=args.method, seed=seed,
                                 vi_rank=rank, **base)
            s = res.summary
            rows.append((args.method, rank, seed, s["ess_per_grad_min"],
                         s["rhat_max"], s.get("vi_is_ess_frac")))
            save_result(args.results_dir, s)
            print(f"{args.method} rank={rank} seed={seed}: "
                  f"ess/grad={s['ess_per_grad_min']:.1f} "
                  f"rhat={s['rhat_max']:.3f} "
                  f"is_ess={s.get('vi_is_ess_frac'):.4f}", flush=True)
            jax.clear_caches()
        if args.include_ncp:
            res = run_experiment(spec, method="ncp", seed=seed, **base)
            s = res.summary
            rows.append(("ncp", None, seed, s["ess_per_grad_min"],
                         s["rhat_max"], None))
            save_result(args.results_dir, s)
            print(f"ncp seed={seed}: "
                  f"ess/grad={s['ess_per_grad_min']:.1f} "
                  f"rhat={s['rhat_max']:.3f}", flush=True)
            jax.clear_caches()

    print("\nmethod  rank  seed  ess/grad  rhat   q*_is_ess")
    for m, r, sd, epg, rh, ie in rows:
        print(f"{m:6} {str(r):>4} {sd:5d} {epg:9.1f} {rh:6.3f} "
              f"{ie if ie is not None else '-'}")
    # append across invocations (the sweep is run in several background
    # passes); dedupe on (method, rank, seed), newest wins
    path = os.path.join(args.results_dir, "rank_probe_table.json")
    prior = []
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
    merged = {(e["method"], e["rank"], e["seed"]): e for e in prior}
    for m, r, sd, epg, rh, ie in rows:
        merged[(m, r, sd)] = dict(method=m, rank=r, seed=sd,
                                  ess_per_grad=epg, rhat=rh, is_ess=ie)
    with open(path, "w") as f:
        json.dump(list(merged.values()), f, indent=1)


if __name__ == "__main__":
    main()
