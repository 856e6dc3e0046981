"""Probe: is the flagship HMC/ChEES program's HLO reproducible across
fresh interpreters?  (ROADMAP "Hygiene": one observed persistent-cache
miss between identical bench runs.)

The persistent compile cache keys on the *unoptimized* HLO module (plus
compile options/backend), so any trace-time nondeterminism — hash-
randomized iteration order over site-name strings, nondeterministic
constant folding, id()-dependent anything — shows up as a different
`lower(...).as_text()` between processes.  This probe builds the bench
program (bench.py's `run`, chees engine, flagship shapes) in N child
interpreters with *different* PYTHONHASHSEEDs (the default bench
environment has it unset, i.e. randomized), hashes the canonicalized
HLO text, and diffs the first mismatch.

Usage:
    python experiments/probe_hlo_determinism.py            # parent, N=4
    python experiments/probe_hlo_determinism.py --child F  # one emit
"""

import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def emit(out_path: str) -> None:
    sys.path.insert(0, REPO)  # script dir is experiments/, not the repo
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from autoreparam_tpu.core import get_model_info, make_potential_fn
    from autoreparam_tpu.inference.chees import CheesConfig, run_chees
    from autoreparam_tpu.models import get_model
    from autoreparam_tpu.reparam import (eligible_sites, make_vip_model,
                                         recover_fn)

    spec = get_model("radon")  # flagship: radon-MN cVIP pipeline
    shapes = eligible_sites(spec.model, spec.args)
    lam = {s: jnp.full(sh, 0.5) for s, sh in shapes.items()}
    info = get_model_info(make_vip_model(spec.model, lam), spec.args)

    from autoreparam_tpu.inference import hmc as H

    num_chains, num_warmup, num_samples = 8192, 500, 1000
    ccfg = CheesConfig(num_warmup=num_warmup, num_samples=num_samples,
                       max_leapfrog_steps=256, criterion="snaper_rate")
    hcfg = H.HMCConfig(num_warmup=num_warmup, num_samples=num_samples,
                       num_leapfrog_steps=16)

    def make_collect(lam):
        rec = recover_fn(make_vip_model(spec.model, lam), info, spec.args)

        def collect(zrow):
            return jnp.concatenate(
                [v.reshape(-1) for v in rec(zrow).values()])

        return collect

    @jax.jit
    def run_c(i, k, lam, im):
        pot = make_potential_fn(make_vip_model(spec.model, lam), info,
                                spec.args)
        return run_chees(pot, i, k, ccfg, inv_mass_diag=im,
                         collect_fn=make_collect(lam))

    @jax.jit
    def run_h(i, k, lam, im):
        pot = make_potential_fn(make_vip_model(spec.model, lam), info,
                                spec.args)
        return H.run_hmc(pot, i, k, hcfg, inv_mass_diag=im,
                         collect_fn=make_collect(lam))

    i = jax.ShapeDtypeStruct((num_chains, info.dim), jnp.float32)
    k = jax.ShapeDtypeStruct((2,), jnp.uint32)
    im = jax.ShapeDtypeStruct((info.dim,), jnp.float32)
    lam_abs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), lam)
    out = {"hashseed": os.environ.get("PYTHONHASHSEED", "<unset>")}
    for tag, fn in (("chees", run_c), ("hmc", run_h)):
        text = fn.lower(i, k, lam_abs, im).as_text()
        # strip metadata XLA's cache key also ignores (source locations)
        canon = re.sub(r'metadata=\{[^}]*\}', '', text)
        with open(f"{out_path}.{tag}", "w") as f:
            f.write(canon)
        out[f"sha256_{tag}"] = hashlib.sha256(canon.encode()).hexdigest()
        out[f"sha256_raw_{tag}"] = hashlib.sha256(text.encode()).hexdigest()
        out[f"lines_{tag}"] = canon.count("\n")
    print(json.dumps(out))


def main() -> int:
    if "--child" in sys.argv:
        emit(sys.argv[sys.argv.index("--child") + 1])
        return 0

    n = 4
    results = []
    for i in range(n):
        out = f"/tmp/hlo_probe_{i}.txt"
        env = dict(os.environ, PYTHONHASHSEED=str(1000 + 7 * i),
                   PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", out],
            capture_output=True, text=True, env=env, cwd=REPO,
            timeout=1800)
        if p.returncode != 0:
            print(p.stdout)
            print(p.stderr[-3000:])
            return 1
        rec = json.loads(p.stdout.strip().splitlines()[-1])
        rec["path"] = out
        results.append(rec)
        print(f"child {i}: chees={rec['sha256_chees'][:12]} "
              f"hmc={rec['sha256_hmc'][:12]} hashseed={rec['hashseed']}")

    verdict, rc = {}, 0
    for tag in ("chees", "hmc"):
        canon_ok = len({r[f"sha256_{tag}"] for r in results}) == 1
        raw_ok = len({r[f"sha256_raw_{tag}"] for r in results}) == 1
        verdict[f"{tag}_canonical_deterministic"] = canon_ok
        verdict[f"{tag}_raw_deterministic"] = raw_ok
        if not canon_ok:
            rc = 2
            a = results[0]
            b = next(r for r in results
                     if r[f"sha256_{tag}"] != a[f"sha256_{tag}"])
            dpath = f"/tmp/hlo_probe_diff_{tag}.txt"
            subprocess.run(["diff", f"{a['path']}.{tag}",
                            f"{b['path']}.{tag}"],
                           stdout=open(dpath, "w"))
            print(f"first 40 diff lines -> {dpath}:")
            with open(dpath) as f:
                for line in f.read().splitlines()[:40]:
                    print(line)
    print(json.dumps(verdict))
    return rc


if __name__ == "__main__":
    sys.exit(main())
