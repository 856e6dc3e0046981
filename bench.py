#!/usr/bin/env python
"""Headline benchmark: radon-MN VIP-HMC ESS/sec per chip.

BASELINE.md north star: >= 50x a CPU reference implementation of the same
pipeline (the reference's own stack was TFP-on-CPU/GPU; no TFP exists in
this environment, so the CPU baseline is THIS framework on the CPU
backend with a typical 4-chain configuration — same model, same
statistical pipeline, measured the same way, cached in
BENCH_BASELINE_CPU.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ESS/s", "vs_baseline": N}

Method: cVIP pipeline — short VI phase learns per-variable lambda, then
the ChEES-HMC engine (cross-chain adaptive trajectory lengths; BENCH
ENGINE env var selects "chees" (default) or fixed-L "hmc") with
q*-derived diagonal mass, 8192 chains on one chip.  ESS is the
min-over-dimensions cross-chain ESS of model-space samples; wall time is
the steady-state (post-compile) warmup+sampling time.  Compile time is
excluded (it is a one-off; reported separately in the breakdown).
The CPU baseline runs the reference-style fixed-L HMC pipeline (the
engine the reference had), 4 chains.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE_CPU.json")


def log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def run_pipeline(num_chains, num_warmup, num_samples, num_leapfrog,
                 vi_steps, seed=0, engine="hmc"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compile cache: first bench run pays the XLA compile,
    # every later run (and the driver's round-end run) hits the cache
    cache_dir = os.path.join(REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 0.0: persist even trivial eager ops — on the 1-core host each
        # tiny op (reshape/concatenate/PRNG) costs ~0.5s to compile and
        # a dozen of them run before the jitted programs; at the 1s
        # default threshold they were recompiled EVERY bench run
        # (measured: ~5s of the VI-phase wall)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:
        log(f"compile cache unavailable: {e}")
    if os.environ.get("BENCH_PRNG", "rbg") == "rbg":
        # counter-based RngBitGenerator keys: momentum/accept draws are
        # ~90*C normals per transition and threefry is VPU-bound on TPU;
        # rbg cuts that fixed cost (production PRNG choice, scoped to
        # the bench pipeline — library default stays threefry)
        jax.config.update("jax_default_prng_impl", "rbg")

    from autoreparam_tpu.core import get_model_info, make_potential_fn
    from autoreparam_tpu.inference import hmc as H
    from autoreparam_tpu.inference import diagnostics as dg
    from autoreparam_tpu.inference.vi import fit_vi
    from autoreparam_tpu.models import get_model
    from autoreparam_tpu.reparam import make_vip_model
    from autoreparam_tpu.reparam.handler import eligible_sites, recover_fn

    spec = get_model("radon", "MN")
    base_model = spec.model
    if os.environ.get("BENCH_TAIL_TRANSPORT", "0") == "1":
        # Gaussian tail transport on the HalfCauchy sigma-sites (the
        # E-BFMI < 0.3 heavy-tail energy pathology CP/NCP/VIP cannot
        # touch; reparam.strategies.TailTransport) — A/B knob
        from autoreparam_tpu.reparam import make_tail_transport_model
        base_model = make_tail_transport_model(base_model,
                                               model_args=spec.args)
        log("tail transport: ON (sigma sites -> Gaussian-base latents)")
    key = jax.random.PRNGKey(seed)
    k_vi, k_init, k_run = jax.random.split(key, 3)
    log(f"pipeline start: chains={num_chains} backend={jax.default_backend()}")

    # Session connect: this process's FIRST device op queues behind the
    # axon service's cleanup of earlier client sessions — measured 3s
    # (idle tunnel) up to ~295s (heavy process churn), and the preflight
    # subprocess passing does NOT exempt the main process (the wedge is
    # per-session).  Absorb it here, reported separately, so vi_wall /
    # the amortized-cold metric measure the pipeline, not the tunnel.
    t_conn = time.perf_counter()
    jax.block_until_ready(jnp.zeros((8,)) + 1.0)
    session_connect_s = time.perf_counter() - t_conn
    log(f"session connect (first device op): {session_connect_s:.1f}s")

    # --- VI phase: learn lambda (cVIP) --------------------------------
    t0 = time.perf_counter()
    # site discovery is a semantic trace (structure only, values
    # irrelevant) but runs EAGER ops — on the default TPU backend each
    # one pays a tunnel RTT, and under a degraded axon service this
    # measured 82s for what is ~1s of host work.  Pin it to the host
    # CPU device; the compiled VI/HMC phases below are unaffected.
    # KNOWN RESIDUAL: even CPU-pinned, this phase still measured 37s
    # once right after a wedge cleared (vs 1.4s on a healthy service) —
    # some per-op path still round-trips the axon client.  The cold
    # numbers (vi_wall_s, amortized_cold) therefore vary with service
    # health; the steady numbers are the stable pipeline metrics.
    with jax.default_device(jax.devices("cpu")[0]):
        sites = tuple(eligible_sites(base_model, spec.args))
    t_sites = time.perf_counter() - t0
    log(f"VI breakdown: eligible_sites {t_sites:.2f}s")
    if os.environ.get("BENCH_VI_AUTO", "0") == "1":
        # plateau-gated budget (vi.fit_vi_auto): ELBO-chunked early
        # stop + cosine tail instead of the hand-picked step count —
        # the amortized-ESS/s lever (VI wall dominates the pipeline
        # at the bench's sampling speed)
        from autoreparam_tpu.inference.vi import fit_vi_auto
        vi = fit_vi_auto(base_model, spec.args, vip_sites=sites,
                         max_steps=vi_steps, chunk_steps=250,
                         tail_steps=250, num_mc_samples=8,
                         learning_rate=0.05, key=k_vi)
    else:
        vi = fit_vi(base_model, spec.args, vip_sites=sites,
                    num_steps=vi_steps, num_mc_samples=8,
                    learning_rate=0.05, key=k_vi)
    jax.block_until_ready(vi.loc)
    vi_wall = time.perf_counter() - t0
    log(f"VI done in {vi_wall:.1f}s")
    # Steady-state VI wall (always measured — it costs one more ~1.3s
    # fit): a second identical fit re-pays Python trace+lowering
    # (fit_vi builds fresh closures, so the jit cache misses) but hits
    # the in-process/persistent executable caches.  This is the
    # MARGINAL per-dataset cost of the VI phase in a resident process —
    # what a production service pays per model after its first — and
    # the denominator of the steady amortized metric below; the
    # first-call extra (disk-cache load + eager-op compiles, measured
    # 7.1s vs 1.29s on TPU) is reported as the cold number.
    t1 = time.perf_counter()
    vi2 = fit_vi(base_model, spec.args, vip_sites=sites,
                 num_steps=vi_steps, num_mc_samples=8,
                 learning_rate=0.05, key=k_vi)
    jax.block_until_ready(vi2.loc)
    vi_wall_steady = time.perf_counter() - t1
    log(f"VI steady (second identical fit): {vi_wall_steady:.2f}s "
        f"(trace+lower+execute; first-call extra = disk-cache load "
        f"+ eager-op compiles)")
    del vi2

    # λ and the q*-derived mass enter as traced ARGUMENTS (not closure
    # constants): the HLO is then identical across bench invocations, so
    # the persistent compile cache hits even though VI re-learns λ.
    lam_template = vi.lam
    with jax.default_device(jax.devices("cpu")[0]):
        # structure discovery only — host-pinned like eligible_sites
        info = get_model_info(make_vip_model(base_model, lam_template),
                              spec.args)

    cfg = H.HMCConfig(num_warmup=num_warmup, num_samples=num_samples,
                      num_leapfrog_steps=num_leapfrog)
    eps = jax.random.normal(k_init, (num_chains, info.dim))
    init = vi.loc + vi.scale * eps
    inv_mass = vi.scale ** 2

    def make_collect(lam):
        # model-space recovery fused INTO the sampling scan: the z-space
        # sample array never materializes (collect_fn stores only the
        # recovered row), halving peak sample memory — which is what
        # bounds num_samples on the 16G chip
        rec = recover_fn(make_vip_model(base_model, lam), info, spec.args)

        def collect(zrow):  # (D,) -> (Dtot,) model space
            return jnp.concatenate(
                [v.reshape(-1) for v in rec(zrow).values()])

        return collect

    if engine == "chees":
        from autoreparam_tpu.inference.chees import (CheesConfig,
                                                     run_chees)
        ccfg = CheesConfig(num_warmup=num_warmup,
                           num_samples=num_samples,
                           max_leapfrog_steps=256,
                           criterion=os.environ.get(
                               "BENCH_CRITERION", "snaper_rate"))

        @jax.jit
        def run(i, k, lam, im):
            pot = make_potential_fn(make_vip_model(base_model, lam),
                                    info, spec.args)
            return run_chees(pot, i, k, ccfg, inv_mass_diag=im,
                             collect_fn=make_collect(lam))
    elif engine == "ghmc":
        from autoreparam_tpu.inference.ghmc import GHMCConfig, run_ghmc

        # one gradient per step: thin keeps the kept-sample count (and
        # the (S, C, D) sample memory) equal to the other engines while
        # matching their per-sample gradient budget (~T leapfrogs)
        thin = int(os.environ.get("BENCH_GHMC_THIN", 8))
        gcfg = GHMCConfig(num_warmup=num_warmup * thin,
                          num_samples=num_samples, thin=thin)

        @jax.jit
        def run(i, k, lam, im):
            pot = make_potential_fn(make_vip_model(base_model, lam),
                                    info, spec.args)
            return run_ghmc(pot, i, k, gcfg, inv_mass_diag=im,
                            collect_fn=make_collect(lam))
    else:
        @jax.jit
        def run(i, k, lam, im):
            pot = make_potential_fn(make_vip_model(base_model, lam),
                                    info, spec.args)
            return H.run_hmc(pot, i, k, cfg, inv_mass_diag=im,
                             collect_fn=make_collect(lam))

    def _sync(x):
        # block_until_ready is unreliable through the axon tunnel
        # (returns before execution completes); a host fetch of one
        # element is a true synchronization point.  Index (not ravel):
        # ravel of the (S, C, D) sample array can materialize a copy.
        jax.block_until_ready(x)
        import numpy as _np
        leaf = jax.tree.leaves(x)[0]
        _np.asarray(leaf[(0,) * leaf.ndim])

    # compile.  The (S, C, D) sample array is ~40% of chip memory at
    # the default config: drop each run's buffers before the next run
    # or two live copies OOM the chip.
    t0 = time.perf_counter()
    out = run(init, k_run, vi.lam, inv_mass)
    _sync(out)
    compile_and_first = time.perf_counter() - t0
    del out
    log(f"HMC compile+first: {compile_and_first:.1f}s")
    # steady state: two back-to-back runs, fetch-synced, averaged
    t0 = time.perf_counter()
    samples, stats = run(init, k_run, vi.lam, inv_mass)
    _sync(samples)
    del samples, stats
    samples, stats = run(init, k_run, vi.lam, inv_mass)
    _sync(samples)
    wall = (time.perf_counter() - t0) / 2.0
    log(f"HMC steady: {wall:.2f}s")

    # samples are already model space (recovered inside the scan)
    S, C = num_samples, num_chains
    arr = samples
    # MEASURED ESS on the full chain array via the direct-lag path (O(1)
    # extra memory at any chain count; 256 lags >> the Geyer cutoff for
    # these well-mixed chains, tau ~ 3-10).  A 1024-chain-subsample
    # extrapolation (x C/1024, valid for iid chains) is reported
    # alongside as a cross-check of the estimator, not as the headline.
    t0 = time.perf_counter()
    ess = np.asarray(dg.effective_sample_size(arr, max_lags=256))
    log(f"ESS (full, {C} chains): {time.perf_counter()-t0:.1f}s")
    C_tau = min(1024, C)
    ess_extrap = np.asarray(
        dg.effective_sample_size(arr[:, :C_tau], max_lags=256)) * (C / C_tau)
    rhat = np.asarray(dg.potential_scale_reduction(arr))
    # nested R-hat (Margossian et al. 2024): the convergence check built
    # for exactly this many-chains regime — pools chains into 64
    # superchains so between-group bias can't hide behind short chains.
    nrhat = np.asarray(dg.nested_rhat(arr, num_superchains=64)) \
        if C % 64 == 0 else rhat
    extra = {}
    if engine == "chees":
        extra = {"trajectory_length": float(np.asarray(
                     stats["trajectory_length"])),
                 "mean_leapfrog_per_sample": float(np.asarray(
                     stats["num_grad_evals_per_sample"])),
                 "criterion": ccfg.criterion}
    elif engine == "ghmc":
        extra = {"mean_leapfrog_per_sample": float(np.asarray(
                     stats["num_grad_evals_per_sample"])),
                 "ghmc_step_size_mean": float(np.asarray(
                     stats["step_size"]).mean())}
    return {
        "engine": engine,
        **extra,
        "ess_min": float(ess.min()),                  # measured, all chains
        "ess_mean": float(ess.mean()),
        "ess_min_extrapolated_1024": float(ess_extrap.min()),
        "rhat_max": float(rhat.max()),
        "nested_rhat_max": float(nrhat.max()),
        # ebfmi_min over 8192 chains is an extreme-value statistic of
        # noisy per-chain estimates; the quantiles say whether a low min
        # is a tail artifact or a sick typical chain (PERF.md "E-BFMI").
        **({"ebfmi_min": float(np.asarray(
                dg.ebfmi(stats["energy"])).min()),
            "ebfmi_p05": float(np.percentile(np.asarray(
                dg.ebfmi(stats["energy"])), 5)),
            "ebfmi_median": float(np.median(np.asarray(
                dg.ebfmi(stats["energy"]))))}
           if "energy" in stats else {"ebfmi_min": None}),
        "converged": bool(rhat.max() < 1.05),
        "wall_s": wall,
        "vi_wall_s": vi_wall,
        "vi_wall_steady_s": vi_wall_steady,
        "compile_s": compile_and_first - wall,
        "session_connect_s": session_connect_s,
        "ess_per_sec": float(ess.min() / wall),
        # amortized = sampling + the VI phase that learned lambda.
        # Steady uses the marginal (resident-process) VI wall; cold
        # uses the first-invocation VI wall incl. disk-cache load and
        # eager-op compiles.  Compile of the sampling program excluded
        # in both (one-off, persistently cached), as labeled in PERF.
        "ess_per_sec_amortized": float(ess.min()
                                       / (wall + vi_wall_steady)),
        "ess_per_sec_amortized_cold": float(ess.min()
                                            / (wall + vi_wall)),
        "num_chains": num_chains,
        "num_samples": num_samples,
        "tail_transport": os.environ.get("BENCH_TAIL_TRANSPORT",
                                         "0") == "1",
        "vi_auto": os.environ.get("BENCH_VI_AUTO", "0") == "1",
        "backend": jax.default_backend(),
        "lambda_mean": {k: float(np.asarray(v).mean())
                        for k, v in vi.lam.items()},
    }


def cpu_baseline():
    """Load cached CPU baseline, else measure it in a CPU subprocess."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_MODE"] = "baseline"
    out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                         env=env, capture_output=True, text=True,
                         timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(data, f, indent=1)
    return data


#: Why the last tpu_preflight() returned False — recorded into the
#: degraded JSON line so a driver-captured CPU fallback says what the
#: TPU actually did (VERDICT r4 weak #1: the r4 fallback artifact
#: carried no failure provenance).
PREFLIGHT_DIAGNOSIS = None


def tpu_preflight(
        timeout_s=int(os.environ.get("BENCH_PREFLIGHT_TIMEOUT", 240)),
        attempts=int(os.environ.get("BENCH_PREFLIGHT_ATTEMPTS", 5))):
    """Probe TPU availability in a subprocess (the axon tunnel can hang
    for minutes before failing UNAVAILABLE; a hung in-process backend
    init would take the whole bench down with it).  Returns True when a
    trivial compiled op completes on the TPU within the timeout.

    The probe prints phase markers so a failure is attributable:
    "ENUM <n> <platform>" after device enumeration, the matmul result
    after compute.  A timeout with ENUM seen is the documented
    zombie-session wedge (devices enumerate, compute queues behind a
    dead session — CLAUDE.md); the settle wait between attempts is
    sized to outlast it.  Wedge durations measured in round 5 range
    from ~5 min (typical post-process-churn) to ~25 min (after heavy
    back-to-back TPU process turnover), so 5 attempts x 240s + the
    escalating settles cover ~36 min before the CPU fallback."""
    global PREFLIGHT_DIAGNOSIS
    code = ("import jax; ds = jax.devices(); "
            "print('ENUM', len(ds), ds[0].platform, flush=True); "
            "import jax.numpy as jnp; x = jnp.ones((8, 8)); "
            "print('COMPUTE', float((x @ x).sum()), flush=True)")
    for attempt in range(attempts):
        # Popen + poll, NOT subprocess.run(timeout=...): run() KILLS the
        # probe mid-TPU-op on timeout, and a client killed mid-op leaves
        # the axon service wedged for the minutes that follow — the next
        # connect enumerates devices fine but compute requests queue
        # behind the zombie session (observed 2026-08-19: three bench
        # runs in a row hung in the VI phase at <1% CPU after their own
        # timed-out preflights were killed; CLAUDE.md's "killed
        # mid-compile runs have previously faulted later jobs" is the
        # same failure).  On timeout the probe is LEFT RUNNING to finish
        # and exit on its own — it is one trivial matmul.
        out_path = os.path.join(REPO, ".preflight_probe.out")
        with open(out_path, "w") as out_f:
            proc = subprocess.Popen([sys.executable, "-c", code],
                                    stdout=out_f,
                                    stderr=subprocess.STDOUT)
        deadline = time.monotonic() + timeout_s
        rc = None
        while time.monotonic() < deadline:
            rc = proc.poll()
            if rc is not None:
                break
            time.sleep(2.0)

        def _probe_out():
            try:
                with open(out_path) as f:
                    return f.read()
            except OSError:
                return ""

        if rc == 0 and "COMPUTE" in _probe_out():
            PREFLIGHT_DIAGNOSIS = None
            return True
        txt = _probe_out()
        enum_seen = "ENUM" in txt
        phase = ("compute-hang (devices enumerated — the zombie-session "
                 "wedge)" if enum_seen and rc is None
                 else "enumeration-hang (no devices listed)"
                 if rc is None
                 else f"probe exit rc={rc}")
        tail = txt.strip().splitlines()[-3:]
        PREFLIGHT_DIAGNOSIS = {
            "attempt": attempt + 1, "phase": phase,
            "timeout_s": timeout_s, "probe_tail": tail,
        }
        log(f"TPU preflight attempt {attempt + 1}/{attempts}: {phase}"
            + (f"; tail={tail}" if tail else ""))
        if rc is None:
            log("probe left to finish on its own (never killed mid-op)")
        if attempt + 1 < attempts:
            # escalating settle: the wedge clears on its own once the
            # zombie session times out server-side (minutes); waiting
            # here is what turns a transient wedge into a real-TPU
            # BENCH artifact instead of a CPU fallback.
            settle = 120.0 * (attempt + 1)
            log(f"settling {settle:.0f}s before retry")
            time.sleep(settle)
    return False


def main():
    mode = os.environ.get("BENCH_MODE", "tpu")
    if mode == "baseline":
        # CPU reference: typical 4-chain practitioner config, run TO
        # CONVERGENCE (R-hat < 1.05) — ESS estimates above R-hat ~1.1
        # are unreliable, which would make the speedup ratio soft.
        warmup, samples = 2000, 2000
        for attempt in range(3):
            res = run_pipeline(num_chains=4, num_warmup=warmup,
                               num_samples=samples, num_leapfrog=16,
                               vi_steps=1500)
            if res["rhat_max"] < 1.05:
                break
            log(f"baseline rhat {res['rhat_max']:.3f} >= 1.05; doubling")
            warmup *= 2
            samples *= 2
        print(json.dumps(res))
        return

    degraded = False
    if mode == "tpu" and not tpu_preflight():
        # Tunnel down: fall back to CPU so the bench still emits its
        # JSON line (clearly marked) instead of crashing. Shrink the
        # run — 8192 chains on the 1-core host would not finish.
        log("TPU unavailable — falling back to a DEGRADED CPU run")
        import jax
        jax.config.update("jax_platforms", "cpu")
        degraded = True
        os.environ.setdefault("BENCH_CHAINS", "64")
        os.environ.setdefault("BENCH_SAMPLES", "500")

    # 250/1000 measured best on the 16G chip: ChEES T-adaptation
    # converges in ~150 warmup steps (tail-averaged), and samples
    # amortize the warmup + per-step fixed costs; S much beyond 1000
    # OOMs the (S, C, D) sample + model-space arrays.
    res = run_pipeline(
        num_chains=int(os.environ.get("BENCH_CHAINS", 8192)),
        num_warmup=int(os.environ.get("BENCH_WARMUP", 250)),
        num_samples=int(os.environ.get("BENCH_SAMPLES", 1000)),
        num_leapfrog=16,
        vi_steps=int(os.environ.get("BENCH_VI_STEPS", 1500)),
        engine=os.environ.get("BENCH_ENGINE", "chees"))
    res["degraded_cpu_fallback"] = degraded
    if degraded and PREFLIGHT_DIAGNOSIS is not None:
        res["preflight_diagnosis"] = PREFLIGHT_DIAGNOSIS
    if degraded:
        # the degraded line is NOT the framework's TPU performance;
        # surface the newest committed real-TPU measurement alongside
        # (clearly labeled, with its provenance) so the round artifact
        # still carries the hardware number the CPU fallback replaces.
        # newest committed bench_*.json whose detail ran on real TPU
        bench_dir = os.path.join(REPO, "results", "bench")
        candidates = sorted(
            (p for p in os.listdir(bench_dir)
             if p.startswith("bench_") and p.endswith(".json")),
            key=lambda p: os.path.getmtime(os.path.join(bench_dir, p)),
            reverse=True)
        last = None
        try:
            prev = None
            for name in candidates:
                path = os.path.join(bench_dir, name)
                with open(path) as f:
                    cand = json.load(f)
                detail = cand.get("detail", cand)
                # default-config runs only: knob A/B artifacts (ghmc
                # engine, tail transport, plateau-gated VI) measure a
                # different pipeline and must not stand in for the
                # headline when the tunnel is down.
                if detail.get("backend") == "tpu" and \
                        not detail.get("degraded_cpu_fallback") and \
                        detail.get("engine", "chees") == "chees" and \
                        not detail.get("tail_transport") and \
                        not detail.get("vi_auto"):
                    prev, last = cand, path
                    break
            if prev is None:
                raise FileNotFoundError("no committed real-TPU bench JSON")
            res["last_good_tpu"] = {
                "source": os.path.relpath(last, REPO),
                "mtime": time.strftime(
                    "%Y-%m-%d %H:%M", time.gmtime(os.path.getmtime(last))),
                "ess_per_sec": prev.get("detail", prev).get("ess_per_sec"),
                "vs_baseline": prev.get("vs_baseline"),
            }
        except Exception as e:
            res["last_good_tpu"] = {"error": str(e)}
    try:
        base = cpu_baseline()
        vs = res["ess_per_sec"] / base["ess_per_sec"]
    except Exception as e:  # baseline unavailable: report raw
        base = {"error": str(e)}
        vs = float("nan")
    payload = {
        "metric": "radon_MN_vip_hmc_ess_per_sec_per_chip",
        "value": round(res["ess_per_sec"], 2),
        "unit": "min-ESS/s",
        "vs_baseline": (round(vs, 2) if vs == vs else None),
        "detail": res,
        "baseline_cpu": base,
        # freshness guard: artifacts saved under results/bench/ carry
        # their measurement time so tools/check_freshness.py can catch
        # a PERF.md rendered before the newest measurement
        "timestamp": time.time(),
    }
    print(json.dumps(payload))
    # Write the committed-artifact copy directly (pretty-printed, with
    # trailing newline) so results/bench/ files are machine-generated
    # end to end — no hand re-formatting step in the provenance chain
    # (ADVICE r4: bench_r4_slice.json was post-processed outside
    # bench.py).  BENCH_SAVE names the file; default bench_latest.json.
    save_name = os.environ.get("BENCH_SAVE", "bench_latest.json")
    save_path = os.path.join(REPO, "results", "bench", save_name)
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    with open(save_path, "w") as f:
        json.dump(payload, f, indent=4)
        f.write("\n")
    log(f"artifact written: {os.path.relpath(save_path, REPO)}")


if __name__ == "__main__":
    main()
