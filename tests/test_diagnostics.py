"""ESS / R-hat diagnostics vs theory (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu.inference import diagnostics as dg


def test_ess_iid_close_to_n():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2000, 4, 3))
    ess = np.asarray(dg.effective_sample_size(x))
    assert ess.shape == (3,)
    n = 2000 * 4
    assert np.all(ess > 0.6 * n)
    assert np.all(ess < 1.4 * n)


def test_ess_ar1_matches_theory():
    """AR(1) with coefficient φ has ESS/N = (1-φ)/(1+φ)."""
    phi = 0.9
    rng = np.random.default_rng(0)
    S, C = 8000, 4
    eps = rng.normal(size=(S, C)) * np.sqrt(1 - phi ** 2)
    x = np.zeros((S, C))
    for t in range(1, S):
        x[t] = phi * x[t - 1] + eps[t]
    ess = float(dg.effective_sample_size(jnp.asarray(x[..., None],
                                                    jnp.float32))[0])
    want = S * C * (1 - phi) / (1 + phi)
    assert 0.5 * want < ess < 2.0 * want


def test_rhat_converged_vs_not():
    key = jax.random.PRNGKey(1)
    good = jax.random.normal(key, (1000, 4, 2))
    r = np.asarray(dg.potential_scale_reduction(good))
    assert np.all(r < 1.02)
    # shift one chain: R-hat must blow up
    bad = good.at[:, 0, :].add(5.0)
    r2 = np.asarray(dg.potential_scale_reduction(bad))
    assert np.all(r2 > 1.5)


def test_ess_detects_stuck_chain_mixture():
    """Half the chains stuck at +3, half at -3: between-chain variance
    must crush the ESS."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (500, 8, 1)) * 0.1
    offsets = jnp.tile(jnp.asarray([3.0, -3.0]), 4)
    x = x + offsets[None, :, None]
    ess = float(dg.effective_sample_size(x)[0])
    assert ess < 100.0  # far below S*C = 4000


def test_ess_per_grad_normalisation():
    ess = jnp.asarray(100.0)
    # paper metric: ESS/1000 grads; iHMC doubles the gradient cost
    v = float(dg.ess_per_grad(ess, num_samples=1000,
                              num_leapfrog_steps=10))
    assert v == 10.0
    v2 = float(dg.ess_per_grad(ess, 1000, 10, grad_multiplier=2.0))
    assert v2 == 5.0


def test_summarize_shapes():
    x = jax.random.normal(jax.random.PRNGKey(3), (100, 4, 5))
    s = dg.summarize(x)
    assert s["mean"].shape == (5,)
    assert s["ess"].shape == (5,)
    assert s["rhat"].shape == (5,)


def test_direct_lag_ess_matches_fft():
    """Truncated direct-lag autocovariance path must agree with the
    exact FFT path when the Geyer cutoff lands inside the window."""
    phi = 0.7
    rng = np.random.default_rng(1)
    S, C = 2000, 8
    eps = rng.normal(size=(S, C, 2)) * np.sqrt(1 - phi ** 2)
    x = np.zeros((S, C, 2))
    for t in range(1, S):
        x[t] = phi * x[t - 1] + eps[t]
    xj = jnp.asarray(x, jnp.float32)
    exact = np.asarray(dg.effective_sample_size(xj))
    direct = np.asarray(dg.effective_sample_size(xj, max_lags=128))
    np.testing.assert_allclose(direct, exact, rtol=0.02)
    # chunked FFT path agrees too
    chunked = np.asarray(dg.effective_sample_size(xj, chain_chunk=4))
    np.testing.assert_allclose(chunked, exact, rtol=1e-4)
