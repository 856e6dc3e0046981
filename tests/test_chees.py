"""ChEES-HMC: correctness on Gaussian targets + trajectory adaptation."""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu.inference.chees import CheesConfig, run_chees
from autoreparam_tpu.inference import effective_sample_size


def test_chees_standard_normal():
    def pot(z):
        return 0.5 * (z[0] ** 2 + z[1] ** 2 / 4.0)

    C = 64
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (C, 2))
    cfg = CheesConfig(num_warmup=300, num_samples=300,
                      init_step_size=0.2, max_leapfrog_steps=64)
    samples, stats = run_chees(pot, init, key, cfg)
    assert samples.shape == (300, C, 2)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), [0.0, 0.0], atol=0.12)
    np.testing.assert_allclose(flat.std(0), [1.0, 2.0], rtol=0.12)
    # ensemble mass adaptation learned the scales
    np.testing.assert_allclose(np.asarray(stats["inv_mass_diag"]),
                               [1.0, 4.0], rtol=0.5)
    # trajectory length adapted away from init toward O(scale)
    T = float(np.asarray(stats["trajectory_length"]))
    assert 0.3 < T < 20.0
    acc = float(np.asarray(stats["accept_prob"]).mean())
    assert 0.5 < acc <= 1.0
    # good mixing: jittered trajectories decorrelate fast
    ess = np.asarray(effective_sample_size(samples))
    assert np.all(ess > 0.15 * 300 * C)


def test_chees_correlated_gaussian_efficiency():
    """On a badly-scaled correlated Gaussian, adapted trajectories must
    produce usable ESS without any hand-set leapfrog count."""
    rho = 0.95
    cov = np.array([[1.0, rho * 3], [rho * 3, 9.0]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def pot(z):
        return 0.5 * z @ prec @ z

    C = 64
    key = jax.random.PRNGKey(1)
    init = 0.1 * jax.random.normal(key, (C, 2))
    cfg = CheesConfig(num_warmup=400, num_samples=300,
                      init_step_size=0.1, max_leapfrog_steps=128)
    samples, stats = run_chees(pot, init, key, cfg)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.std(0), [1.0, 3.0], rtol=0.15)
    emp_rho = np.corrcoef(flat.T)[0, 1]
    np.testing.assert_allclose(emp_rho, rho, atol=0.06)


def test_snaper_learns_principal_component():
    """SNAPER's streaming power iteration must align with the leading
    eigenvector of the target covariance (mass adaptation off so the
    preconditioned space IS the model space), and the sampler must stay
    correct (SNAPER-HMC, arXiv:2110.11576)."""
    rng = np.random.RandomState(3)
    Q, _ = np.linalg.qr(rng.randn(4, 4))
    evals = np.array([16.0, 1.0, 0.5, 0.25])
    cov = Q @ np.diag(evals) @ Q.T
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def pot(z):
        return 0.5 * z @ prec @ z

    C = 256
    key = jax.random.PRNGKey(2)
    init = jax.random.normal(key, (C, 4))
    cfg = CheesConfig(num_warmup=500, num_samples=300,
                      criterion="snaper_rate", adapt_mass=False,
                      init_step_size=0.2, max_leapfrog_steps=128)
    samples, stats = run_chees(pot, init, key, cfg)
    pc = np.asarray(stats["principal_component"])
    lead = Q[:, 0]
    align = abs(float(pc @ lead))
    assert align > 0.95, f"pc misaligned with leading eigenvector: {align}"
    flat = np.asarray(samples).reshape(-1, 4)
    np.testing.assert_allclose(flat.var(0), np.diag(cov), rtol=0.25)
    # raw-criterion and unknown-criterion config paths
    cfg2 = CheesConfig(num_warmup=50, num_samples=20, criterion="snaper")
    run_chees(pot, init, key, cfg2)
    import pytest
    with pytest.raises(ValueError, match="criterion"):
        run_chees(pot, init, key,
                  CheesConfig(num_warmup=5, num_samples=5,
                              criterion="bogus"))
