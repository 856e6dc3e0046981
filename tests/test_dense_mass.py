"""Dense (full-covariance) mass-matrix HMC: estimator correctness,
posterior correctness on a correlated Gaussian, and the measurable win
over the diagonal metric that motivates it (SURVEY.md §5 items 1-2; the
election88 inter-block-correlation diagnosis in ZOO_FULL.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoreparam_tpu.inference import hmc as H


def _corr_sigma(d, rho):
    """Equicorrelated covariance: badly conditioned for a diagonal
    metric (condition number (1 + (d-1)rho) / (1 - rho))."""
    return (1.0 - rho) * np.eye(d) + rho * np.ones((d, d))


def test_dense_welford_recovers_covariance():
    """Feeding (C, D) snapshots of N(0, Σ) draws recovers Σ."""
    rng = np.random.default_rng(0)
    d, rho = 6, 0.8
    sigma = _corr_sigma(d, rho)
    chol = np.linalg.cholesky(sigma)
    st = H.dense_welford_init(d)
    for _ in range(200):
        z = rng.standard_normal((64, d)) @ chol.T
        st = H.dense_welford_update(st, jnp.asarray(z, jnp.float32))
    cov = np.asarray(H.dense_welford_cov(st))
    # shrinkage weight at count=200 is 200/205; undo it for the check
    w = 200.0 / 205.0
    est = (cov - 1e-3 * (1.0 - w) * np.eye(d)) / w
    np.testing.assert_allclose(est, sigma, atol=0.15)


def test_dense_mass_ops_factor_identity():
    """R from dense_mass_ops satisfies R Rᵀ = Σ⁻¹ (momenta r = R u have
    covariance Σ⁻¹, the dense-metric momentum distribution)."""
    sigma = jnp.asarray(_corr_sigma(5, 0.6), jnp.float32)
    sig_out, r_fac = H.dense_mass_ops(sigma)
    np.testing.assert_allclose(np.asarray(sig_out), np.asarray(sigma),
                               atol=1e-6)
    rrT = np.asarray(r_fac @ r_fac.T)
    np.testing.assert_allclose(rrT, np.linalg.inv(np.asarray(sigma)),
                               atol=1e-3)


def test_dense_mass_ops_fallback_on_bad_matrix():
    """A non-PD Σ (Cholesky fails) falls back to its diagonal instead of
    propagating NaN into the run."""
    bad = jnp.asarray([[1.0, 2.0], [2.0, 1.0]], jnp.float32)  # eig -1, 3
    sig_out, r_fac = H.dense_mass_ops(bad)
    assert np.all(np.isfinite(np.asarray(sig_out)))
    assert np.all(np.isfinite(np.asarray(r_fac)))
    # fallback is the diagonal of the input
    np.testing.assert_allclose(np.asarray(sig_out),
                               np.eye(2, dtype=np.float32), atol=1e-6)


def test_dense_mass_ops_scale_guard_mask():
    """Masked coordinates keep only their variance; cross terms with
    the dense block are zeroed; result stays PD/factorizable."""
    sigma = jnp.asarray(_corr_sigma(4, 0.6), jnp.float32)
    mask = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    sig_out, r_fac = H.dense_mass_ops(sigma, dense_mask=mask)
    s = np.asarray(sig_out)
    # coord 2 decoupled, variance kept
    assert s[2, 2] == pytest.approx(1.0, abs=1e-6)
    assert np.all(s[2, [0, 1, 3]] == 0.0)
    assert np.all(s[[0, 1, 3], 2] == 0.0)
    # dense block untouched
    np.testing.assert_allclose(s[np.ix_([0, 1, 3], [0, 1, 3])],
                               np.asarray(sigma)[np.ix_([0, 1, 3],
                                                        [0, 1, 3])],
                               atol=1e-6)
    rrT = np.asarray(r_fac @ r_fac.T)
    np.testing.assert_allclose(rrT, np.linalg.inv(s), atol=1e-3)


def test_scale_guard_mask_from_model_info():
    """Pipeline mask: Exp-bijected (positive-support) sites -> diag,
    Identity sites -> dense.  radon declares sigma_a/sigma_y as
    HalfCauchy, so exactly those coordinates are guarded."""
    from autoreparam_tpu.inference.pipeline import _scale_guard_mask
    from autoreparam_tpu.core import get_model_info
    from autoreparam_tpu.models import get_model

    spec = get_model("radon", "MN")
    info = get_model_info(spec.model, spec.args, spec.kwargs)
    mask = np.asarray(_scale_guard_mask(info))
    assert mask.shape == (info.dim,)
    by_site = {}
    for s in info.latents:
        by_site[s.name] = mask[s.offset:s.offset + s.size]
    assert np.all(by_site["sigma_a"] == 0.0)
    assert np.all(by_site["sigma_y"] == 0.0)
    assert np.all(by_site["a"] == 1.0)
    assert np.all(by_site["mua"] == 1.0)


def test_dense_leapfrog_energy_and_reversibility():
    sigma = jnp.asarray(_corr_sigma(4, 0.7), jnp.float32)

    def pot(z):
        return 0.5 * jnp.sum(z ** 2)

    pg = jax.value_and_grad(pot)
    z0 = jnp.asarray([1.0, -0.5, 2.0, 0.3])
    r0 = jnp.asarray([0.3, 0.7, -1.2, -0.1])
    _, g0 = pg(z0)
    e0 = pot(z0) + 0.5 * jnp.dot(r0, sigma @ r0)
    z, r, p, g = H.leapfrog_dense(pg, z0, r0, g0, 0.01, sigma, 500)
    e1 = p + 0.5 * jnp.dot(r, sigma @ r)
    assert abs(float(e1 - e0)) < 1e-3
    # reversibility
    z2, r2, _, _ = H.leapfrog_dense(pg, z, -r, g, 0.01, sigma, 500)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z0), atol=1e-3)


@pytest.mark.parametrize("share", [True, "mass"])
def test_dense_hmc_correlated_gaussian_posterior(share):
    """Dense metric on N(0, Σ_corr): correct moments AND a decisive
    min-ESS win over the diagonal metric at the same budget — the
    property the dense metric exists for."""
    d, rho = 16, 0.95
    sigma = _corr_sigma(d, rho)
    prec = jnp.asarray(np.linalg.inv(sigma), jnp.float32)

    def pot(z):
        return 0.5 * jnp.dot(z, prec @ z)

    C = 32
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(jax.random.fold_in(key, 1), (C, d))
    kw = dict(num_warmup=500, num_samples=500, num_leapfrog_steps=4,
              share_adaptation=share)
    cfg_dense = H.HMCConfig(mass_structure="dense", **kw)
    cfg_diag = H.HMCConfig(mass_structure="diag", **kw)
    s_dense, st_dense = H.run_hmc(pot, init, key, cfg_dense)
    s_diag, _ = H.run_hmc(pot, init, key, cfg_diag)

    # learned Σ tracks the target covariance (loose: shrinkage + window)
    est = np.asarray(st_dense["inv_mass_dense"])
    assert np.all(np.isfinite(est))
    corr_est = est / np.sqrt(np.outer(np.diag(est), np.diag(est)))
    assert corr_est[0, 1] > 0.6     # true off-diagonal corr is 0.95

    # moments
    sd = np.asarray(s_dense).reshape(-1, d)
    np.testing.assert_allclose(sd.mean(0), np.zeros(d), atol=0.15)
    np.testing.assert_allclose(sd.var(0), np.diag(sigma), rtol=0.25)

    from autoreparam_tpu.inference import diagnostics as dg
    ess_dense = float(jnp.min(dg.effective_sample_size(
        jnp.asarray(s_dense))))
    ess_diag = float(jnp.min(dg.effective_sample_size(
        jnp.asarray(s_diag))))
    # At rho=0.95, d=16 the diagonal metric pays a condition number of
    # (1 + 15*0.95)/(1 - 0.95) = 305; measured ratios are 440-800x at
    # this budget (probe, 2 seeds) — 5x is a conservative floor.
    assert ess_dense > 5.0 * ess_diag, (ess_dense, ess_diag)


def test_dense_stats_contract():
    """Stats dict keeps the diagonal-path contract (checkpoint/readout
    consumers) plus the full metric."""
    def pot(z):
        return 0.5 * jnp.sum(z ** 2)

    C, d = 8, 3
    cfg = H.HMCConfig(num_warmup=100, num_samples=50,
                      num_leapfrog_steps=4, mass_structure="dense")
    init = jax.random.normal(jax.random.PRNGKey(0), (C, d))
    samples, stats = H.run_hmc(pot, init, jax.random.PRNGKey(1), cfg)
    assert samples.shape == (50, C, d)
    assert stats["inv_mass_diag"].shape == (C, d)
    assert stats["inv_mass_dense"].shape == (d, d)
    assert stats["step_size"].shape == (C,)
    assert stats["num_grad_evals_per_sample"] == 4


def test_dense_sharded_matches_local():
    """Dense metric under the chain mesh: the ensemble-covariance
    reductions become psums over the sharded chain axis and the run
    must produce the same statistics as the local path (same PRNG
    stream, deterministic math — exact up to reduction order)."""
    from autoreparam_tpu.parallel import make_mesh, run_hmc_sharded

    d, rho = 8, 0.9
    sigma = _corr_sigma(d, rho)
    prec = jnp.asarray(np.linalg.inv(sigma), jnp.float32)

    def pot(z):
        return 0.5 * jnp.dot(z, prec @ z)

    C = 32
    key = jax.random.PRNGKey(3)
    init = jax.random.normal(jax.random.fold_in(key, 1), (C, d))
    cfg = H.HMCConfig(num_warmup=300, num_samples=300,
                      num_leapfrog_steps=4, share_adaptation=True,
                      mass_structure="dense")
    mesh = make_mesh()
    s_sh, st_sh = run_hmc_sharded(pot, init, key, cfg, mesh)
    s_lo, st_lo = H.run_hmc(pot, init, key, cfg)
    a, b = np.asarray(s_sh), np.asarray(s_lo)
    # identical program modulo reduction order: moments must agree
    # tightly, and the learned metric must match
    np.testing.assert_allclose(a.mean((0, 1)), b.mean((0, 1)), atol=0.05)
    np.testing.assert_allclose(np.asarray(st_sh["inv_mass_dense"]),
                               np.asarray(st_lo["inv_mass_dense"]),
                               rtol=0.1, atol=0.05)
    # and the sharded run must actually have learned the correlation
    est = np.asarray(st_sh["inv_mass_dense"])
    corr = est / np.sqrt(np.outer(np.diag(est), np.diag(est)))
    assert corr[0, 1] > 0.5


def test_nuts_dense_correlated_gaussian():
    """Dense metric through the NUTS engine: correct moments, learned
    correlation, and a min-ESS win over the diagonal metric (NUTS's
    adaptive depth means the win shows as shorter trees AND better
    per-sample mixing)."""
    from autoreparam_tpu.inference.nuts import run_nuts
    from autoreparam_tpu.inference import diagnostics as dg

    d, rho = 12, 0.95
    sigma = _corr_sigma(d, rho)
    prec = jnp.asarray(np.linalg.inv(sigma), jnp.float32)

    def pot(z):
        return 0.5 * jnp.dot(z, prec @ z)

    C = 16
    key = jax.random.PRNGKey(1)
    init = jax.random.normal(jax.random.fold_in(key, 1), (C, d))
    kw = dict(num_warmup=400, num_samples=400, max_tree_depth=7,
              share_adaptation=True)
    s_dense, st_dense = run_nuts(pot, init, key,
                                 mass_structure="dense", **kw)
    s_diag, st_diag = run_nuts(pot, init, key, **kw)

    est = np.asarray(st_dense["inv_mass_dense"])
    assert est.shape == (d, d) and np.all(np.isfinite(est))
    corr = est / np.sqrt(np.outer(np.diag(est), np.diag(est)))
    assert corr[0, 1] > 0.6

    sd = np.asarray(s_dense).reshape(-1, d)
    np.testing.assert_allclose(sd.mean(0), np.zeros(d), atol=0.2)
    np.testing.assert_allclose(sd.var(0), np.diag(sigma), rtol=0.3)

    ess_dense = float(jnp.min(dg.effective_sample_size(
        jnp.asarray(s_dense))))
    ess_diag = float(jnp.min(dg.effective_sample_size(
        jnp.asarray(s_diag))))
    grads_dense = float(np.asarray(st_dense["num_grad_evals_per_sample"]))
    grads_diag = float(np.asarray(st_diag["num_grad_evals_per_sample"]))
    # per-gradient efficiency is the honest NUTS comparison (adaptive
    # depth spends different budgets); require a clear dense win
    assert (ess_dense / grads_dense) > 2.0 * (ess_diag / grads_diag), (
        ess_dense, grads_dense, ess_diag, grads_diag)


def test_resumable_hmc_rejects_dense():
    """The orbax-resumable runner's checkpoint template stores a
    diagonal mass; a dense config must fail loudly, not silently
    resume with a different kernel."""
    from autoreparam_tpu.utils.checkpoint import ResumableHMC

    cfg = H.HMCConfig(mass_structure="dense")
    with pytest.raises(NotImplementedError):
        ResumableHMC(lambda z: 0.5 * jnp.sum(z ** 2), cfg, "/tmp/x")


def test_pipeline_dense_mass_flag():
    """run_experiment(mass_structure='dense') runs end to end and
    records the effective structure; non-HMC engines fall back to diag
    (recorded, not silently mislabeled)."""
    from autoreparam_tpu.inference.pipeline import run_experiment
    from autoreparam_tpu.models import get_model

    spec = get_model("eight_schools")
    res = run_experiment(spec, method="ncp", num_chains=8,
                         num_warmup=200, num_samples=100,
                         num_leapfrog_steps=4,
                         num_optimization_steps=50,
                         mass_structure="dense")
    assert res.summary["mass_structure"] == "dense"
    assert res.summary["rhat_max"] < 1.3
    res2 = run_experiment(spec, method="ncp", inference="chees",
                          num_chains=8, num_warmup=100, num_samples=100,
                          num_optimization_steps=50,
                          mass_structure="dense")
    assert res2.summary["mass_structure"] == "diag"
