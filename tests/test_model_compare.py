"""WAIC / PSIS-LOO (inference/model_compare.py) vs the analytic
leave-one-out predictive of the conjugate normal-normal model — an
exact oracle, not a golden value."""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu.inference import loo, waic

SIGMA, TAU, N, S = 1.0, 2.0, 20, 8000


def _rig(seed=0):
    rng = np.random.default_rng(seed)
    y = rng.normal(0.7, SIGMA, size=N).astype(np.float32)
    # posterior of mu given all y (conjugate)
    v = 1.0 / (1.0 / TAU ** 2 + N / SIGMA ** 2)
    m = float(v * y.sum() / SIGMA ** 2)
    mu_draws = (m + np.sqrt(v) * rng.normal(size=S)).astype(np.float32)
    loglik = (-0.5 * ((y[None, :] - mu_draws[:, None]) / SIGMA) ** 2
              - 0.5 * np.log(2 * np.pi * SIGMA ** 2)).astype(np.float32)
    # exact LOO: p(y_i | y_-i) = N(m_-i, v_-i + sigma^2)
    v_l = 1.0 / (1.0 / TAU ** 2 + (N - 1) / SIGMA ** 2)
    m_l = v_l * (y.sum() - y) / SIGMA ** 2
    var_pred = v_l + SIGMA ** 2
    exact = (-0.5 * (y - m_l) ** 2 / var_pred
             - 0.5 * np.log(2 * np.pi * var_pred))
    # delta-method analytic p_waic: Σ_i var_mu(log p_i)
    #   = v/σ⁴·Σ(y_i−m)² + N·v²/(2σ⁴)
    p_waic = (v / SIGMA ** 4 * ((y - m) ** 2).sum()
              + N * v ** 2 / (2 * SIGMA ** 4))
    return y, mu_draws, loglik, float(exact.sum()), float(p_waic)


def test_psis_loo_matches_analytic_loo():
    _, _, loglik, exact_elpd, _ = _rig()
    res = loo(jnp.asarray(loglik))
    assert abs(float(res.elpd) - exact_elpd) < 0.15, (
        float(res.elpd), exact_elpd)
    # well-specified model, exact posterior draws: k should be small
    assert float(res.pareto_k.max()) < 0.5, np.asarray(res.pareto_k)
    assert float(res.p_eff) > 0


def test_waic_matches_loo_when_well_specified():
    _, _, loglik, exact_elpd, p_waic = _rig(seed=1)
    w = waic(jnp.asarray(loglik))
    l = loo(jnp.asarray(loglik))
    assert abs(float(w.elpd) - float(l.elpd)) < 0.1
    assert abs(float(w.elpd) - exact_elpd) < 0.2
    # delta-method analytic p_waic for the conjugate model
    assert abs(float(w.p_eff) - p_waic) < 0.1, (float(w.p_eff), p_waic)


def test_pareto_k_flags_proposal_mismatch():
    """Evaluating LOO with draws from the PRIOR (grossly overdispersed
    vs the posterior) must raise the Pareto-k diagnostic relative to
    exact posterior draws."""
    y, _, loglik_post, _, _ = _rig(seed=2)
    rng = np.random.default_rng(3)
    mu_prior = (TAU * rng.normal(size=S)).astype(np.float32)
    loglik_prior = (-0.5 * ((y[None, :] - mu_prior[:, None]) / SIGMA) ** 2
                    - 0.5 * np.log(2 * np.pi * SIGMA ** 2))
    k_post = float(loo(jnp.asarray(loglik_post)).pareto_k.mean())
    k_prior = float(loo(jnp.asarray(loglik_prior)).pareto_k.mean())
    assert k_prior > k_post + 0.1, (k_prior, k_post)


def test_loo_through_ppl_stack():
    """pointwise_log_likelihood -> loo on a real posterior (funnel-NCP
    via run_experiment): finite elpd, k mostly healthy."""
    from autoreparam_tpu.core.predictive import pointwise_log_likelihood
    from autoreparam_tpu.core import sample as ppl_sample
    from autoreparam_tpu import dists as d
    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models.zoo import ModelSpec

    y = np.array([1.2, 0.8, 2.1, 1.7, -0.3, 0.9, 1.1, 0.4], np.float32)

    def model(y):
        mu = ppl_sample("mu", d.Normal(0.0, 3.0))
        log_s = ppl_sample("log_s", d.Normal(0.0, 1.0))
        ppl_sample("y", d.Normal(mu, jnp.exp(log_s)), obs=y)

    spec = ModelSpec("mc", model, (y,), {}, "")
    res = run_experiment(spec, method="cp", inference="hmc",
                         num_chains=16, num_warmup=300, num_samples=300,
                         num_leapfrog_steps=8, seed=0)
    post = {k: jnp.asarray(np.asarray(v).reshape(-1))
            for k, v in res.samples.items()}   # (S*C,) per site
    n_draws = post["mu"].shape[0]
    ll = pointwise_log_likelihood(model, post, model_args=(y,))["y"]
    assert ll.shape == (n_draws, 8)
    out = loo(ll)
    assert np.isfinite(float(out.elpd))
    assert float(out.pareto_k.max()) < 0.7


def test_gpd_fit_matches_scipy_mle():
    """The Zhang-Stephens shape estimate must agree in sign and rough
    magnitude with scipy's genpareto MLE on true GPD samples of both
    signs (the sign convention flip is the classic bug here)."""
    import scipy.stats as st

    from autoreparam_tpu.inference.model_compare import _fit_gpd_k

    rng = np.random.default_rng(0)
    for xi_true in (0.6, -0.3):
        x = st.genpareto(xi_true, scale=1.0).rvs(4000,
                                                 random_state=rng)
        xi_hat, sigma_hat = _fit_gpd_k(jnp.asarray(x, jnp.float32))
        assert abs(float(xi_hat) - xi_true) < 0.12, (xi_true,
                                                     float(xi_hat))
        assert abs(float(sigma_hat) - 1.0) < 0.15, float(sigma_hat)


def test_compare_ranks_and_paired_se():
    """compare() must prefer the true model and report the PAIRED
    difference SE (the per-model SEs are correlated through shared
    data, so diff_se << se_a + se_b when models are similar)."""
    from autoreparam_tpu.inference import compare

    y, _, loglik_good, _, _ = _rig(seed=4)
    rng = np.random.default_rng(5)
    # a mis-specified model: fixed mu far from the truth
    mu_bad = (3.0 + 0.01 * rng.normal(size=S)).astype(np.float32)
    loglik_bad = (-0.5 * ((y[None, :] - mu_bad[:, None]) / SIGMA) ** 2
                  - 0.5 * np.log(2 * np.pi * SIGMA ** 2))
    res = compare({"good": loo(jnp.asarray(loglik_good)),
                   "bad": loo(jnp.asarray(loglik_bad))})
    assert [r["model"] for r in res] == ["good", "bad"]
    assert res[0]["elpd_diff"] == 0.0
    assert res[1]["elpd_diff"] > 3 * res[1]["diff_se"]  # decisive
