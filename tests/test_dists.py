"""Distribution log-probs vs scipy closed forms; sampling moments.

SURVEY.md §5 item 1: unit, math-level tests against closed forms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from autoreparam_tpu import dists as d

KEY = jax.random.PRNGKey(0)
X_POS = np.array([0.1, 0.5, 1.0, 2.3, 7.0], dtype=np.float32)
X_REAL = np.array([-3.0, -0.7, 0.0, 0.4, 2.5], dtype=np.float32)
X_UNIT = np.array([0.05, 0.3, 0.5, 0.9], dtype=np.float32)


CASES = [
    (d.Normal(0.5, 2.0), X_REAL, st.norm(0.5, 2.0)),
    (d.HalfNormal(1.5), X_POS, st.halfnorm(scale=1.5)),
    (d.Cauchy(-1.0, 2.0), X_REAL, st.cauchy(-1.0, 2.0)),
    (d.HalfCauchy(3.0), X_POS, st.halfcauchy(scale=3.0)),
    (d.LogNormal(0.3, 0.8), X_POS, st.lognorm(s=0.8, scale=np.exp(0.3))),
    (d.Exponential(1.7), X_POS, st.expon(scale=1 / 1.7)),
    (d.Gamma(2.5, 1.3), X_POS, st.gamma(2.5, scale=1 / 1.3)),
    (d.InverseGamma(3.0, 2.0), X_POS, st.invgamma(3.0, scale=2.0)),
    (d.StudentT(4.0, 0.5, 1.5), X_REAL, st.t(4.0, loc=0.5, scale=1.5)),
    (d.Uniform(-1.0, 3.0), np.array([-0.5, 0.0, 2.9], np.float32),
     st.uniform(-1.0, 4.0)),
    (d.Beta(2.0, 3.5), X_UNIT, st.beta(2.0, 3.5)),
    (d.Laplace(0.3, 1.7), X_REAL, st.laplace(0.3, 1.7)),
    (d.Gumbel(-0.5, 2.2), X_REAL, st.gumbel_r(-0.5, 2.2)),
    (d.Logistic(0.7, 1.3), X_REAL, st.logistic(0.7, 1.3)),
]


@pytest.mark.parametrize("dist,x,ref", CASES,
                         ids=[type(c[0]).__name__ for c in CASES])
def test_log_prob_matches_scipy(dist, x, ref):
    got = np.asarray(dist.log_prob(jnp.asarray(x)))
    want = ref.logpdf(x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bernoulli_binomial_poisson_log_prob():
    logits = np.float32(0.7)
    p = 1 / (1 + np.exp(-0.7))
    np.testing.assert_allclose(
        np.asarray(d.Bernoulli(logits).log_prob(jnp.float32(1.0))),
        np.log(p), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(d.Bernoulli(logits).log_prob(jnp.float32(0.0))),
        np.log(1 - p), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(d.Binomial(10, logits).log_prob(jnp.float32(4.0))),
        st.binom(10, p).logpmf(4), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(d.Poisson(3.5).log_prob(jnp.float32(2.0))),
        st.poisson(3.5).logpmf(2), rtol=1e-3)


SAMPLE_CASES = [
    (d.Normal(1.0, 2.0), 1.0, 2.0),
    (d.HalfNormal(2.0), 2.0 * np.sqrt(2 / np.pi),
     2.0 * np.sqrt(1 - 2 / np.pi)),
    (d.LogNormal(0.0, 0.5), np.exp(0.125),
     np.sqrt((np.exp(0.25) - 1) * np.exp(0.25))),
    (d.Exponential(2.0), 0.5, 0.5),
    (d.Gamma(3.0, 2.0), 1.5, np.sqrt(3) / 2),
    (d.InverseGamma(4.0, 3.0), 1.0, np.sqrt(1.0 / 2.0)),
    (d.Uniform(-1.0, 1.0), 0.0, np.sqrt(1 / 3)),
    (d.Beta(2.0, 3.0), 0.4, np.sqrt(2.0 * 3.0 / (25.0 * 6.0))),
    (d.Laplace(1.0, 0.5), 1.0, 0.5 * np.sqrt(2.0)),
    (d.Gumbel(0.0, 1.0), np.euler_gamma, np.pi / np.sqrt(6.0)),
    (d.Logistic(-1.0, 0.5), -1.0, 0.5 * np.pi / np.sqrt(3.0)),
    # NB(r, logits): mean r*e^l, var mean/(1-p) with p = sigmoid(l)
    (d.NegativeBinomial(5.0, -0.7), 5.0 * np.exp(-0.7),
     np.sqrt(5.0 * np.exp(-0.7) / (1.0 - 1 / (1 + np.exp(0.7))))),
]


@pytest.mark.parametrize("dist,mean,std", SAMPLE_CASES,
                         ids=[type(c[0]).__name__ for c in SAMPLE_CASES])
def test_sampling_moments(dist, mean, std):
    n = 20000
    s = np.asarray(dist.sample(KEY, (n,)))
    assert s.shape == (n,)
    se = std / np.sqrt(n)
    assert abs(s.mean() - mean) < 5 * se
    assert abs(s.std() - std) < 10 * se  # loose: std of std


def test_sample_shapes_broadcast():
    dist = d.Normal(jnp.zeros((3,)), jnp.ones((3,)))
    s = dist.sample(KEY, (5,))
    assert s.shape == (5, 3)
    lp = dist.log_prob(s)
    assert lp.shape == (5, 3)


def test_support_bijectors_roundtrip():
    for dist in [d.HalfNormal(1.0), d.Gamma(2.0, 2.0), d.Uniform(-2.0, 5.0)]:
        b = dist.support_bijector()
        x = jnp.asarray([-1.5, 0.0, 2.0])
        y = b.forward(x)
        np.testing.assert_allclose(np.asarray(b.inverse(y)), np.asarray(x),
                                   rtol=1e-4, atol=1e-4)
        # elementwise logdet matches autodiff
        want = np.log(np.abs(np.asarray(jax.vmap(jax.grad(
            lambda t: b.forward(t)))(x))))
        np.testing.assert_allclose(np.asarray(b.log_det_jacobian(x)), want,
                                   rtol=1e-3, atol=1e-4)


def test_dirichlet_log_prob_matches_scipy():
    conc = np.array([2.0, 0.7, 3.1], np.float32)
    x = np.array([[0.2, 0.3, 0.5], [0.6, 0.1, 0.3]], np.float32)
    got = np.asarray(d.Dirichlet(conc).log_prob(jnp.asarray(x)))
    want = np.array([st.dirichlet(conc).logpdf(row) for row in x])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dirichlet_sampling():
    conc = jnp.asarray([1.5, 2.5, 4.0])
    s = np.asarray(d.Dirichlet(conc).sample(KEY, (20000,)))
    assert s.shape == (20000, 3)
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(s.mean(0), np.asarray(conc) / 8.0, atol=5e-3)


def test_stick_breaking_bijector():
    b = d.StickBreaking()
    x = jnp.asarray([[-0.8, 0.3, 1.7, -2.0], [0.0, 0.0, 0.0, 0.0]],
                    jnp.float32)
    y = b.forward(x)
    assert y.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-6)
    assert (np.asarray(y) > 0).all()
    # x = 0 maps to the uniform simplex (the log(K-1-k) offset's job)
    np.testing.assert_allclose(np.asarray(y[1]), 0.2, atol=1e-6)
    # roundtrip
    np.testing.assert_allclose(np.asarray(b.inverse(y)), np.asarray(x),
                               rtol=1e-4, atol=1e-5)
    # summed logdet matches the autodiff Jacobian of the K-1 free coords
    for row in np.asarray(x):
        jac = jax.jacfwd(lambda t: b.forward(t)[:-1])(jnp.asarray(row))
        _, want = np.linalg.slogdet(np.asarray(jac))
        got = float(b.log_det_jacobian(jnp.asarray(row)).sum())
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert b.unconstrained_shape((7, 5)) == (7, 4)


def test_categorical_log_prob_and_sampling():
    logits = jnp.log(jnp.asarray([0.2, 0.3, 0.5]))
    dist = d.Categorical(logits)
    x = jnp.asarray([0.0, 1.0, 2.0, 2.0])
    got = np.asarray(dist.log_prob(x))
    np.testing.assert_allclose(got, np.log([0.2, 0.3, 0.5, 0.5]),
                               rtol=1e-5)
    s = np.asarray(dist.sample(KEY, (40000,)))
    freq = np.bincount(s.astype(int), minlength=3) / s.size
    np.testing.assert_allclose(freq, [0.2, 0.3, 0.5], atol=0.01)
    assert dist.batch_shape == ()


def test_multinomial_log_prob_matches_scipy():
    p = np.array([0.2, 0.3, 0.5])
    dist = d.Multinomial(10.0, jnp.log(jnp.asarray(p)))
    x = np.array([[2, 3, 5], [0, 4, 6], [10, 0, 0]], np.float32)
    got = np.asarray(dist.log_prob(jnp.asarray(x)))
    want = st.multinomial(10, p).logpmf(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    s = np.asarray(dist.sample(KEY, (8000,)))
    assert s.shape == (8000, 3)
    np.testing.assert_allclose(s.sum(-1), 10.0)
    np.testing.assert_allclose(s.mean(0), 10 * p, atol=0.1)


def test_beta_dirichlet_multinomial_hmc_posterior():
    """Beta-Bernoulli + Dirichlet-Multinomial conjugacy through full
    HMC: exercises Sigmoid/StickBreaking support maps (incl. the K-1
    unconstrained coordinate accounting) end-to-end against closed-form
    posteriors."""
    from autoreparam_tpu.core import sample as ppl_sample
    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models.zoo import ModelSpec

    y = np.array([1, 1, 0, 1, 0, 1, 1, 1], np.float32)  # 6 of 8
    counts = np.array([5.0, 2.0, 13.0], np.float32)     # n = 20

    def model(y, counts):
        p = ppl_sample("p", d.Beta(2.0, 2.0))
        w = ppl_sample("w", d.Dirichlet(jnp.asarray([2.0, 3.0, 4.0])))
        logits = jnp.log(p) - jnp.log1p(-p)
        ppl_sample("y", d.Bernoulli(logits), obs=y)
        ppl_sample("c", d.Multinomial(counts.sum(), jnp.log(w)),
                   obs=counts)

    spec = ModelSpec(name="beta_dirichlet", model=model,
                     args=(y, counts), kwargs={},
                     description="Beta+Dirichlet-Multinomial smoke model")
    res = run_experiment(spec, method="cp", inference="hmc", num_chains=16,
                         num_warmup=400, num_samples=400,
                         num_leapfrog_steps=8, seed=0)
    names = list(res.summary["param_names"])
    mean, std = np.asarray(res.summary["mean"]), np.asarray(
        res.summary["std"])
    post = st.beta(2.0 + 6.0, 2.0 + 2.0)  # conjugate posterior of p
    ip = names.index("p")
    assert abs(mean[ip] - post.mean()) < 0.03
    assert abs(std[ip] - post.std()) < 0.03
    # conjugate posterior of w: Dirichlet(conc + counts)
    post_conc = np.array([2, 3, 4]) + counts
    mw = np.array([mean[names.index(f"w[{i}]")] for i in range(3)])
    sw = np.array([std[names.index(f"w[{i}]")] for i in range(3)])
    want_mean = post_conc / post_conc.sum()
    a0 = post_conc.sum()
    want_std = np.sqrt(want_mean * (1 - want_mean) / (a0 + 1))
    np.testing.assert_allclose(mw, want_mean, atol=0.03)
    np.testing.assert_allclose(sw, want_std, atol=0.02)
    assert res.summary["rhat_max"] < 1.1


def test_multivariate_normal_matches_scipy():
    L = np.array([[1.5, 0.0, 0.0],
                  [0.4, 1.1, 0.0],
                  [-0.3, 0.7, 0.8]], np.float32)
    loc = np.array([0.5, -1.0, 2.0], np.float32)
    cov = L @ L.T
    dist = d.MultivariateNormal(jnp.asarray(loc), jnp.asarray(L))
    x = np.array([[0.0, 0.0, 0.0], [1.0, -2.0, 2.5]], np.float32)
    got = np.asarray(dist.log_prob(jnp.asarray(x)))
    want = st.multivariate_normal(loc, cov).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    s = np.asarray(dist.sample(KEY, (40000,)))
    np.testing.assert_allclose(s.mean(0), loc, atol=0.03)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.05)


def test_multivariate_normal_hmc_posterior():
    """MVN prior + iid Normal likelihood -> closed-form MVN posterior;
    checks the full-covariance density through HMC (Identity support)."""
    from autoreparam_tpu.core import sample as ppl_sample
    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models.zoo import ModelSpec

    L = np.array([[1.0, 0.0], [0.8, 0.6]], np.float32)
    cov = L @ L.T
    sigma = 0.7
    y = np.array([1.3, -0.4], np.float32)

    def model(y):
        z = ppl_sample("z", d.MultivariateNormal(jnp.zeros(2),
                                                 jnp.asarray(L)))
        ppl_sample("y", d.Normal(z, sigma), obs=y)

    res = run_experiment(ModelSpec("mvn", model, (y,), {}, ""),
                         method="cp", inference="hmc", num_chains=16,
                         num_warmup=300, num_samples=300,
                         num_leapfrog_steps=8, seed=0)
    prec = np.linalg.inv(cov) + np.eye(2) / sigma ** 2
    post_cov = np.linalg.inv(prec)
    post_mean = post_cov @ (y / sigma ** 2)
    names = list(res.summary["param_names"])
    mean = np.asarray(res.summary["mean"])
    std = np.asarray(res.summary["std"])
    got_m = np.array([mean[names.index(f"z[{i}]")] for i in range(2)])
    got_s = np.array([std[names.index(f"z[{i}]")] for i in range(2)])
    np.testing.assert_allclose(got_m, post_mean, atol=0.05)
    np.testing.assert_allclose(got_s, np.sqrt(np.diag(post_cov)),
                               atol=0.04)
    assert res.summary["rhat_max"] < 1.1


def test_negative_binomial_log_prob_matches_scipy():
    r, logits = 5.0, -0.7
    x = np.array([0.0, 1.0, 3.0, 10.0], np.float32)
    got = np.asarray(d.NegativeBinomial(r, logits).log_prob(
        jnp.asarray(x)))
    # scipy nbinom(n, p): failures before the nth success at success
    # prob p; our "success" odds are e^logits, so p_scipy = sigmoid(-l)
    want = st.nbinom(5, 1.0 / (1.0 + np.exp(logits))).logpmf(x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_new_loc_scale_families_are_vip_eligible():
    """Laplace/Gumbel/Logistic hierarchies must be NCP/VIP-rewritable
    (the loc_scale protocol is all the reparam layer needs)."""
    from autoreparam_tpu import sample
    from autoreparam_tpu.reparam.handler import eligible_sites
    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models.zoo import ModelSpec

    y = jnp.asarray([0.3, -1.2, 2.1, 0.7])

    def model(y):
        mu = sample("mu", d.Normal(0., 5.))
        log_b = sample("log_b", d.Normal(0., 1.))
        eff_l = sample("eff_l", d.Laplace(mu, jnp.exp(log_b)),
                       sample_shape=(2,))
        eff_g = sample("eff_g", d.Gumbel(mu, jnp.exp(log_b)))
        eff_s = sample("eff_s", d.Logistic(mu, jnp.exp(log_b)))
        pred = jnp.concatenate([eff_l, eff_g[None], eff_s[None]])
        sample("y", d.Normal(pred, 1.0), obs=y)

    sites = eligible_sites(model, (y,))
    assert {"eff_l", "eff_g", "eff_s"} <= set(sites)

    spec = ModelSpec("mixed_ls", model, (y,), {}, "test", ("y",))
    res = run_experiment(spec, method="ncp", inference="hmc",
                         num_chains=8, num_warmup=150, num_samples=150,
                         num_leapfrog_steps=8, seed=0)
    assert res.summary["rhat_max"] < 1.2
    assert res.summary["finite_fraction_min"] == 1.0
