"""VI engine: conjugate-posterior recovery, λ learning (SURVEY.md §5).

The λ-learning checks mirror the paper's qualitative result: weak data
⇒ NCP optimal (λ→0); strong data ⇒ CP optimal (λ→1).
"""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu import dists as d
from autoreparam_tpu.core import sample
from autoreparam_tpu.inference.vi import (discretize_lambda, fit_vi,
                                          fit_vip_vi)


def test_conjugate_normal_posterior():
    """x ~ N(0, 2); y_i ~ N(x, 1), 4 obs → analytic posterior."""
    y = jnp.asarray([1.0, 0.5, 1.5, 1.0])

    def m(y):
        x = sample("x", d.Normal(0.0, 2.0))
        sample("y", d.Normal(x, 1.0), obs=y)

    prec = 1 / 4.0 + 4.0
    post_var = 1 / prec
    post_mean = post_var * float(y.sum())
    res = fit_vi(m, (y,), num_steps=2000, num_mc_samples=8,
                 learning_rate=0.05, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(res.loc[0]), post_mean, atol=0.1)
    np.testing.assert_allclose(float(res.scale[0]), np.sqrt(post_var),
                               rtol=0.25)
    # ELBO increased
    e = np.asarray(res.elbo_trace)
    assert e[-100:].mean() > e[:100].mean()


def test_lambda_goes_to_ncp_with_no_data():
    """Funnel (no data): NCP (λ=0) makes the posterior a product of
    independent Gaussians, exactly representable by mean-field q — the
    optimal λ is 0."""

    def funnel():
        v = sample("v", d.Normal(0.0, 3.0))
        sample("x", d.Normal(0.0, jnp.exp(v / 2.0)), sample_shape=(4,))

    res = fit_vip_vi(funnel, num_steps=3000, num_mc_samples=8,
                     learning_rate=0.05, key=jax.random.PRNGKey(1))
    lam_x = np.asarray(res.lam["x"])
    assert lam_x.mean() < 0.25, lam_x


def test_lambda_goes_to_cp_with_strong_data():
    """Strongly-identified latent: CP (λ=1) decorrelates the posterior."""

    def m(y):
        mu = sample("mu", d.Normal(0.0, 3.0))
        z = sample("z", d.Normal(mu, 1.0), sample_shape=(4,))
        sample("y", d.Normal(z, 0.05), obs=y)

    y = jnp.asarray([1.0, -0.5, 0.8, 0.2])
    res = fit_vi(m, (y,), vip_sites=("z",), num_steps=3000,
                 num_mc_samples=8, learning_rate=0.05,
                 key=jax.random.PRNGKey(2))
    lam_z = np.asarray(res.lam["z"])
    assert lam_z.mean() > 0.75, lam_z


def test_discretize_lambda():
    lam = {"a": jnp.asarray([0.1, 0.7, 0.5]), "b": jnp.asarray(0.9)}
    dl = discretize_lambda(lam)
    np.testing.assert_array_equal(np.asarray(dl["a"]), [0.0, 1.0, 0.0])
    assert float(dl["b"]) == 1.0
    # threshold > 0.5: ambiguous elements round toward NCP
    dl = discretize_lambda(lam, threshold=0.75)
    np.testing.assert_array_equal(np.asarray(dl["a"]), [0.0, 0.0, 0.0])
    assert float(dl["b"]) == 1.0
    # keep_band: mid elements stay continuous, confident ones snap
    dl = discretize_lambda(lam, keep_band=0.25)
    np.testing.assert_allclose(np.asarray(dl["a"]), [0.0, 0.7, 0.5])
    assert float(dl["b"]) == 1.0


def test_radon_lambda_tracks_identifiability():
    """The paper's core mechanism on real structure: counties with more
    observations learn larger lambda (toward CP), sparse counties learn
    lambda ~ 0 (NCP).  Checked as the correlation between log county
    size and the learned per-element lambda."""
    from autoreparam_tpu.inference.vi import fit_vip_vi
    from autoreparam_tpu.models import get_model, data as data_lib

    spec = get_model("radon", "MN")
    res = fit_vip_vi(spec.model, spec.args, num_steps=1500,
                     num_mc_samples=4, learning_rate=0.05,
                     key=jax.random.PRNGKey(0))
    lam_a = np.asarray(res.lam["a"])
    ds = data_lib.load_radon("MN")
    counts = np.bincount(ds["county_idx"],
                         minlength=int(ds["n_counties"]))
    r = np.corrcoef(np.log1p(counts), lam_a)[0, 1]
    assert r > 0.5, r
    assert lam_a[counts < 5].mean() < lam_a[counts > 20].mean()


def test_vi_restarts_pick_best_basin():
    """num_restarts vmaps independent (q, lambda) fits and keeps the
    best final ELBO; with perturbed lambda-logit inits this explores
    CP/NCP basins a single run can miss (VERDICT r2 task 3)."""
    from autoreparam_tpu.inference.vi import fit_vip_vi
    from autoreparam_tpu.models import get_model

    spec = get_model("eight_schools")
    r1 = fit_vip_vi(spec.model, spec.args, num_steps=600,
                    num_mc_samples=4, key=jax.random.PRNGKey(0))
    r4 = fit_vip_vi(spec.model, spec.args, num_steps=600,
                    num_mc_samples=4, key=jax.random.PRNGKey(0),
                    num_restarts=4)
    e1 = float(np.asarray(r1.elbo_trace)[-100:].mean())
    e4 = float(np.asarray(r4.elbo_trace)[-100:].mean())
    # the best of 4 restarts can't be (meaningfully) worse than one run
    assert e4 >= e1 - 1.0, (e1, e4)
    assert np.all(np.isfinite(np.asarray(r4.loc)))


def test_vi_lambda_site_tying():
    """lam_tie='site' learns one lambda per site (scalar), and the
    tied fit still lands in the right regime (eight_schools: theta
    should go non-centered, lambda < 0.5)."""
    from autoreparam_tpu.inference.vi import fit_vip_vi
    from autoreparam_tpu.models import get_model

    spec = get_model("eight_schools")
    res = fit_vip_vi(spec.model, spec.args, num_steps=1000,
                     num_mc_samples=4, key=jax.random.PRNGKey(0),
                     lam_tie="site")
    assert all(np.asarray(v).ndim == 0 for v in res.lam.values())
    assert float(res.lam["theta"]) < 0.5


def test_fit_vi_auto_plateau_and_quality():
    """Plateau-gated VI stops before max_steps on an easy posterior and
    matches the fixed-budget fit's ELBO and lambda; restarts path runs."""
    from autoreparam_tpu.inference.vi import fit_vi, fit_vi_auto
    from autoreparam_tpu.models import get_model
    from autoreparam_tpu.reparam.handler import eligible_sites

    spec = get_model("eight_schools")
    sites = tuple(eligible_sites(spec.model, spec.args, spec.kwargs))
    auto = fit_vi_auto(spec.model, spec.args, spec.kwargs,
                       vip_sites=sites, max_steps=20000, chunk_steps=400,
                       key=jax.random.PRNGKey(0))
    fixed = fit_vi(spec.model, spec.args, spec.kwargs, vip_sites=sites,
                   num_steps=3000, key=jax.random.PRNGKey(0))
    assert auto.elbo_trace.shape[0] < 20000      # stopped early
    e_auto = float(np.mean(np.asarray(auto.elbo_trace)[-100:]))
    e_fix = float(np.mean(np.asarray(fixed.elbo_trace)[-100:]))
    assert abs(e_auto - e_fix) < 0.5             # within half a nat
    for k in auto.lam:
        np.testing.assert_allclose(np.asarray(auto.lam[k]),
                                   np.asarray(fixed.lam[k]), atol=0.1)
    # pipeline surface: num_optimization_steps="auto"
    from autoreparam_tpu.inference import run_experiment
    res = run_experiment(spec, method="cvip", inference="vi",
                         num_optimization_steps="auto", seed=0)
    assert res.summary["num_optimization_steps"] < 20000
    assert np.isfinite(res.summary["elbo"])


def test_low_rank_vi_recovers_correlated_gaussian():
    """q_rank=1 must close the mean-field gap on a strongly correlated
    2-D Gaussian: higher ELBO (by ~the 0.5*log(1-rho^2) KL gap) and
    near-true marginal scales; log_q matches the dense MVN density."""
    import scipy.stats as st
    from autoreparam_tpu import sample, dists as d
    from autoreparam_tpu.inference.vi import fit_vi

    def model():
        x = sample("x", d.Normal(0., 1.))
        sample("y", d.Normal(x, 0.1))

    mf = fit_vi(model, num_steps=2500, key=jax.random.PRNGKey(0))
    lr = fit_vi(model, num_steps=2500, q_rank=1,
                key=jax.random.PRNGKey(0))
    e_mf = float(np.mean(np.asarray(mf.elbo_trace)[-100:]))
    e_lr = float(np.mean(np.asarray(lr.elbo_trace)[-100:]))
    assert e_lr > e_mf + 1.5          # mean-field loses ~2.3 nats here

    # mean-field collapses to the conditional scales (~0.1); the
    # low-rank marginals must recover the true ~1.0
    assert float(np.asarray(mf.scale).max()) < 0.3
    ms = np.asarray(lr.marginal_scale())
    np.testing.assert_allclose(ms, [1.0, np.sqrt(1.01)], rtol=0.2)

    # log_q agrees with the dense multivariate normal
    z = np.asarray(lr.sample(jax.random.PRNGKey(1), 5))
    cov = (np.diag(np.asarray(lr.scale) ** 2)
           + np.asarray(lr.factor) @ np.asarray(lr.factor).T)
    want = st.multivariate_normal(np.asarray(lr.loc), cov).logpdf(z)
    np.testing.assert_allclose(np.asarray(lr.log_q(jnp.asarray(z))),
                               want, rtol=1e-4, atol=1e-3)
