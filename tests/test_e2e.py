"""End-to-end golden tests (SURVEY.md §5 items 2-3).

- Neal's funnel under NCP has an *analytic* posterior (= the prior):
  v ~ N(0,3) — a strict oracle for sampler correctness.
- eight_schools: CP and NCP runs must agree in posterior means within
  MC error (the reference's own headline invariant).

Sized for the 1-CPU CI box; the bench harness runs the big versions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu.core import get_model_info, make_potential_fn
from autoreparam_tpu.inference import (HMCConfig, effective_sample_size,
                                       potential_scale_reduction, run_hmc)
from autoreparam_tpu.models import get_model
from autoreparam_tpu.reparam import aux_name, make_ncp_model, recover_fn


def _run(model, args, cfg, key, n_chains=16, recover=None):
    info = get_model_info(model, args)
    pot = make_potential_fn(model, info, args)
    init = 0.5 * jax.random.normal(key, (n_chains, info.dim))
    collect = recover if recover is not None else None
    samples, stats = run_hmc(pot, init, key, cfg, collect_fn=collect)
    return info, samples, stats


def test_funnel_ncp_recovers_analytic_posterior():
    spec = get_model("neals_funnel")
    ncp = make_ncp_model(spec.model, model_args=spec.args)
    info = get_model_info(ncp, spec.args)
    rec = recover_fn(ncp, info, spec.args)
    cfg = HMCConfig(num_warmup=500, num_samples=500, num_leapfrog_steps=8,
                    init_step_size=0.5)
    pot = make_potential_fn(ncp, info, spec.args)
    key = jax.random.PRNGKey(0)
    C = 16
    init = 0.5 * jax.random.normal(key, (C, info.dim))
    samples, stats = run_hmc(pot, init, key, cfg,
                             collect_fn=lambda z: rec(z)["v"])
    v = np.asarray(samples)  # (S, C)
    ess = float(effective_sample_size(jnp.asarray(v[..., None]))[0])
    se = 3.0 / np.sqrt(ess)
    assert abs(v.mean()) < 4 * se, (v.mean(), ess)
    np.testing.assert_allclose(v.std(), 3.0, rtol=0.15)
    rhat = float(potential_scale_reduction(jnp.asarray(v[..., None]))[0])
    assert rhat < 1.1


def test_eight_schools_cp_ncp_agree():
    spec = get_model("eight_schools")
    key = jax.random.PRNGKey(1)
    cfg = HMCConfig(num_warmup=400, num_samples=400, num_leapfrog_steps=8,
                    init_step_size=0.3)

    # CP run
    info_cp = get_model_info(spec.model, spec.args)
    pot_cp = make_potential_fn(spec.model, info_cp, spec.args)
    init = 0.5 * jax.random.normal(key, (16, info_cp.dim))
    s_cp, _ = run_hmc(pot_cp, init, key, cfg)
    mu_idx = info_cp.names.index("mu")
    off = info_cp.latents[mu_idx].offset
    mu_cp = np.asarray(s_cp)[..., off]

    # NCP run
    ncp = make_ncp_model(spec.model, sites=["theta"],
                         model_args=spec.args)
    info_ncp = get_model_info(ncp, spec.args)
    pot_ncp = make_potential_fn(ncp, info_ncp, spec.args)
    init2 = 0.5 * jax.random.normal(jax.random.PRNGKey(2),
                                    (16, info_ncp.dim))
    s_ncp, _ = run_hmc(pot_ncp, init2, jax.random.PRNGKey(2), cfg)
    off2 = info_ncp.latents[info_ncp.names.index("mu")].offset
    mu_ncp = np.asarray(s_ncp)[..., off2]

    ess_cp = float(effective_sample_size(
        jnp.asarray(mu_cp[..., None]))[0])
    ess_ncp = float(effective_sample_size(
        jnp.asarray(mu_ncp[..., None]))[0])
    # posterior sd of mu is ~3.3; MC standard errors
    se = 3.3 * np.sqrt(1 / max(ess_cp, 1) + 1 / max(ess_ncp, 1))
    diff = abs(mu_cp.mean() - mu_ncp.mean())
    assert diff < 4 * se + 0.3, (mu_cp.mean(), mu_ncp.mean(), se)
    # loose golden range from the literature (documented posterior of the
    # N(0,5)/N(0,5) parameterisation): mu posterior mean ~ 4-5
    assert 2.0 < mu_cp.mean() < 7.0


def test_all_methods_agree_on_posterior():
    """SURVEY.md §5 item 3: CP, NCP, cVIP, dVIP, iHMC on the same model
    agree in posterior means within MC error — the reference's own
    headline invariant, checked end-to-end through run_experiment."""
    from autoreparam_tpu.inference.pipeline import run_experiment
    from autoreparam_tpu.models.zoo import ModelSpec
    from autoreparam_tpu import dists as d
    from autoreparam_tpu.core import sample as smp

    y = jnp.asarray([1.2, 0.4, 0.9, 1.6, 0.2, 1.1])

    def m(y):
        mu = smp("mu", d.Normal(0.0, 3.0))
        tau = smp("tau", d.HalfNormal(1.0))
        theta = smp("theta", d.Normal(mu, tau), sample_shape=(6,))
        smp("obs", d.Normal(theta, 0.5), obs=y)

    spec = ModelSpec(name="consistency", model=m, args=(y,), kwargs={},
                     description="", observed=("obs",))
    means, ses = {}, {}
    for method in ["cp", "ncp", "cvip", "dvip", "interleaved"]:
        res = run_experiment(spec, method=method, inference="hmc",
                             num_chains=16, num_warmup=300,
                             num_samples=300, num_leapfrog_steps=8,
                             num_optimization_steps=800,
                             learning_rate=0.05, seed=0)
        i = res.summary["param_names"].index("mu")
        means[method] = res.summary["mean"][i]
        ses[method] = (res.summary["std"][i]
                       / np.sqrt(max(res.summary["ess"][i], 4.0)))
    ref = means["ncp"]
    for method, mval in means.items():
        tol = 5 * np.hypot(ses[method], ses["ncp"]) + 0.05
        assert abs(mval - ref) < tol, (method, mval, ref, tol)


def test_german_gammascale_cross_method_consistency():
    """german_credit_gammascale (SURVEY.md §1): Gamma precisions are not
    location-scale, so only beta is reparameterisable — CP and NCP must
    agree on the posterior, and the cvip pipeline must run end to end
    (its lambda is inert on the Gamma sites by construction)."""
    import numpy as np
    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models import get_model

    spec = get_model("german_credit_gammascale")
    sz = dict(num_chains=8, num_warmup=500, num_samples=400,
              num_leapfrog_steps=8, num_optimization_steps=400)
    runs = {m: run_experiment(spec, method=m, inference="hmc", seed=i,
                              **sz)
            for i, m in enumerate(("cp", "interleaved"))}
    a, b = runs["cp"].summary, runs["interleaved"].summary
    assert a["param_names"] == b["param_names"]
    # beta dims are well-identified; compare those (the log-precision
    # dims need far larger budgets to pin their means tightly)
    for i, name in enumerate(a["param_names"]):
        if not name.startswith("beta"):
            continue
        sd = max(a["std"][i], b["std"][i], 1e-3)
        assert abs(a["mean"][i] - b["mean"][i]) < 0.5 * sd, (
            name, a["mean"][i], b["mean"][i], sd)
    # eligibility: only beta is VIP-eligible on this variant
    from autoreparam_tpu.reparam.handler import eligible_sites
    el = set(eligible_sites(spec.model, spec.args))
    assert el == {"beta"}, el


def test_ebfmi_flags_centered_funnel():
    """The energy diagnostic must fire exactly where reparameterisation
    is needed: funnel-CP's momentum resamples cannot traverse the energy
    marginal (low E-BFMI), funnel-NCP's can."""
    from autoreparam_tpu.inference.pipeline import run_experiment
    spec = get_model("neals_funnel")
    kw = dict(inference="hmc", num_chains=16, num_warmup=300,
              num_samples=300, num_leapfrog_steps=8, seed=0)
    cp = run_experiment(spec, method="cp", **kw)
    ncp = run_experiment(spec, method="ncp", **kw)
    assert ncp.summary["ebfmi_min"] > 0.5
    assert cp.summary["ebfmi_min"] < ncp.summary["ebfmi_min"]
