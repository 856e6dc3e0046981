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
