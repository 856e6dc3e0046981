"""Effect-handler core: trace/substitute/condition/log_density vs
hand-computed densities (SURVEY.md §5 item 1, "Handlers")."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from autoreparam_tpu import dists as d
from autoreparam_tpu.core import (condition, deterministic, get_model_info,
                                  handlers, log_density, make_potential_fn,
                                  sample, sample_prior, seed, trace)


def toy_model(y=None):
    mu = sample("mu", d.Normal(0.0, 3.0))
    sigma = sample("sigma", d.HalfNormal(2.0))
    z = deterministic("z", mu * 2.0)
    sample("obs", d.Normal(mu, sigma), obs=y, sample_shape=(4,))
    return z


Y = jnp.asarray([0.5, -0.2, 1.1, 0.0])


def test_seeded_trace_records_sites():
    tr = trace(seed(toy_model, key=jax.random.PRNGKey(0)))
    sites = tr.get_trace(Y)
    assert list(sites) == ["mu", "sigma", "z", "obs"]
    assert sites["obs"].observed
    assert sites["z"].is_deterministic
    assert np.asarray(sites["sigma"].value) > 0
    np.testing.assert_allclose(np.asarray(sites["z"].value),
                               2 * np.asarray(sites["mu"].value))


def test_seeded_trace_reproducible_and_site_independent():
    k = jax.random.PRNGKey(7)
    t1 = trace(seed(toy_model, key=k)).get_trace(Y)
    t2 = trace(seed(toy_model, key=k)).get_trace(Y)
    np.testing.assert_array_equal(np.asarray(t1["mu"].value),
                                  np.asarray(t2["mu"].value))
    assert not np.allclose(np.asarray(t1["mu"].value),
                           np.asarray(t1["sigma"].value))


def test_log_density_matches_hand_computation():
    params = {"mu": jnp.float32(0.7), "sigma": jnp.float32(1.3)}
    lp, _ = log_density(toy_model, (Y,), {}, params)
    want = (st.norm(0, 3).logpdf(0.7) + st.halfnorm(scale=2).logpdf(1.3)
            + st.norm(0.7, 1.3).logpdf(np.asarray(Y)).sum())
    np.testing.assert_allclose(float(lp), want, rtol=2e-4)


def test_condition_handler():
    def m():
        x = sample("x", d.Normal(0.0, 1.0))
        sample("y", d.Normal(x, 1.0))

    sites = trace(seed(condition(m, data={"y": jnp.float32(2.0)}),
                       key=jax.random.PRNGKey(0))).get_trace()
    assert sites["y"].observed
    assert float(sites["y"].value) == 2.0


def test_model_info_and_potential():
    info = get_model_info(toy_model, (Y,))
    assert info.names == ("mu", "sigma")
    assert info.dim == 2
    # potential = -log p with sigma mapped through Exp + logdet
    pot = make_potential_fn(toy_model, info, (Y,))
    zf = jnp.asarray([0.7, jnp.log(1.3)])
    want_lp = (st.norm(0, 3).logpdf(0.7) + st.halfnorm(scale=2).logpdf(1.3)
               + st.norm(0.7, 1.3).logpdf(np.asarray(Y)).sum()
               + np.log(1.3))  # Exp bijector logdet
    np.testing.assert_allclose(float(pot(zf)), -want_lp, rtol=2e-4)
    # grad flows
    g = jax.grad(pot)(zf)
    assert np.all(np.isfinite(np.asarray(g)))
    # ravel/unravel/constrain round-trips
    vals = info.constrain(zf)
    np.testing.assert_allclose(float(vals["sigma"]), 1.3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(info.unconstrain(vals)),
                               np.asarray(zf), rtol=1e-3, atol=1e-4)


def test_vector_latents_flatten():
    def m():
        a = sample("a", d.Normal(0.0, 1.0), sample_shape=(3,))
        b = sample("b", d.HalfNormal(1.0), sample_shape=(2,))
        sample("obs", d.Normal(a.sum() + b.sum(), 1.0), obs=jnp.float32(0.0))

    info = get_model_info(m)
    assert info.dim == 5
    flat = jnp.arange(5, dtype=jnp.float32)
    vals = info.unravel(flat)
    assert vals["a"].shape == (3,)
    assert vals["b"].shape == (2,)
    np.testing.assert_allclose(np.asarray(info.ravel(vals)),
                               np.asarray(flat))


def test_sample_prior():
    vals = sample_prior(toy_model, jax.random.PRNGKey(3), (Y,))
    assert set(vals) == {"mu", "sigma"}


def test_potential_is_jit_and_vmap_safe():
    info = get_model_info(toy_model, (Y,))
    pot = make_potential_fn(toy_model, info, (Y,))
    batch = jax.random.normal(jax.random.PRNGKey(0), (8, info.dim))
    out = jax.jit(jax.vmap(pot))(batch)
    assert out.shape == (8,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_predictive_and_prior_predictive():
    from autoreparam_tpu.core.predictive import Predictive, prior_predictive

    # prior predictive: y resampled, shapes carry the draw axis
    pp = prior_predictive(toy_model, jax.random.PRNGKey(0), 16, (Y,))
    assert pp["obs"].shape == (16, 4)
    assert pp["mu"].shape == (16,)

    # posterior predictive: condition latents on given draws
    post = {"mu": jnp.linspace(-1, 1, 16),
            "sigma": jnp.full((16,), 0.01)}
    pred = Predictive(toy_model, post)
    out = pred(jax.random.PRNGKey(1), Y)
    assert out["obs"].shape == (16, 4)
    # with sigma ~ 0, predictive obs are pinned near mu
    np.testing.assert_allclose(np.asarray(out["obs"]).mean(-1),
                               np.linspace(-1, 1, 16), atol=0.05)
    # deterministic site replayed
    np.testing.assert_allclose(np.asarray(out["z"]),
                               2 * np.linspace(-1, 1, 16), rtol=1e-5)


def test_pointwise_log_likelihood():
    from autoreparam_tpu.core.predictive import pointwise_log_likelihood
    import scipy.stats as st

    post = {"mu": jnp.asarray([0.0, 1.0]),
            "sigma": jnp.asarray([1.0, 2.0])}
    ll = pointwise_log_likelihood(toy_model, post, (Y,))
    assert ll["obs"].shape == (2, 4)
    want = st.norm(0.0, 1.0).logpdf(np.asarray(Y))
    np.testing.assert_allclose(np.asarray(ll["obs"][0]), want, rtol=1e-4)
