"""Generalized HMC (MEADS-style ensemble adaptation) — inference/ghmc.py.

Oracles (SURVEY.md §5 item 1 style — math, not goldens):
- fixed-hyperparameter kernel exactness on an ASYMMETRIC 1-D target
  (log-space Gamma) with closed-form mean/variance: the momentum
  flip-on-reject is exactly what asymmetric targets expose (a
  symmetric-Gaussian moment test cannot see it), plus the power
  companion proving the no-flip bug would fail by ~67 SE;
- adaptive ensemble on a correlated Gaussian: full posterior
  mean/covariance recovery with the fold machinery live;
- funnel NCP through run_experiment (pipeline integration).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sp

from autoreparam_tpu.inference.ghmc import (GHMCConfig, GHMCState,
                                            ghmc_kernel, run_ghmc)

A = 2.5  # Gamma(A, 1) in log space: z = log g, U(z) = e^z - A z
TRUE_MEAN = float(sp.digamma(A))
TRUE_VAR = float(sp.polygamma(1, A))


def _loggamma_pot(z):
    return jnp.sum(jnp.exp(z) - A * z)


def _run_fixed_kernel(flip, C=256, W=500, S=4000, eps_val=0.9,
                      noise_val=0.1):
    kern = ghmc_kernel(_loggamma_pot, _flip_on_reject=flip)
    km, kw, kr = jax.random.split(jax.random.PRNGKey(0), 3)
    z0 = jnp.full((C, 1), TRUE_MEAN)
    st0 = GHMCState(z0, jax.random.normal(km, (C, 1)),
                    jax.vmap(_loggamma_pot)(z0),
                    jax.vmap(jax.grad(_loggamma_pot))(z0))
    eps = jnp.full((C,), eps_val)
    noise = jnp.full((C,), noise_val)
    sig = jnp.ones((C, 1))

    def step(st, k):
        st, info = kern(st, k, eps, noise, sig)
        return st, (st.z[:, 0], info.accept_prob)

    st0, _ = jax.lax.scan(step, st0, jax.random.split(kw, W))
    _, (draws, aps) = jax.lax.scan(step, st0, jax.random.split(kr, S))
    d = np.asarray(draws).ravel()
    # conservative n_eff (tau ~ 50 at this persistence) for the SE
    se_mean = np.sqrt(TRUE_VAR / (C * S / 50))
    z_score = (d.mean() - TRUE_MEAN) / se_mean
    return z_score, d.var() / TRUE_VAR, float(np.asarray(aps).mean())


def test_ghmc_kernel_exact_on_asymmetric_target():
    z_score, var_ratio, accept = _run_fixed_kernel(flip=True)
    assert 0.4 < accept < 0.95, accept     # rejections DO happen
    assert abs(z_score) < 6.0, z_score
    assert 0.97 < var_ratio < 1.03, var_ratio


def test_ghmc_power_catches_missing_flip():
    """Same rig without the momentum flip on rejection (the classic
    generalized-HMC bug): the asymmetric target's moments must blow
    up — measured ~67 SE mean bias, ~1.5x variance."""
    z_score, var_ratio, _ = _run_fixed_kernel(flip=False)
    assert abs(z_score) > 20.0 or var_ratio > 1.2, (z_score, var_ratio)


def test_ghmc_adaptive_correlated_gaussian():
    """The full MEADS-style machinery (fold-sequential sweep, ensemble
    preconditioner, power-iteration ε and damping) recovers a correlated
    Gaussian's mean and covariance with no hand-set hyperparameters."""
    D = 6
    rng = np.random.default_rng(0)
    Amat = rng.normal(size=(D, D)).astype(np.float32)
    cov = Amat @ Amat.T + np.eye(D, dtype=np.float32) * 0.5
    prec = jnp.asarray(np.linalg.inv(cov).astype(np.float32))

    def pot(z):
        return 0.5 * z @ prec @ z

    C = 64
    init = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (C, D))
    cfg = GHMCConfig(num_warmup=1500, num_samples=3000)
    samples, stats = jax.jit(
        lambda i, k: run_ghmc(pot, i, k, cfg))(init,
                                               jax.random.PRNGKey(1))
    from autoreparam_tpu.inference import diagnostics as dg
    rhat = np.asarray(dg.potential_scale_reduction(np.asarray(samples)))
    assert rhat.max() < 1.05, rhat.max()
    s = np.asarray(samples).reshape(-1, D)
    sd = np.sqrt(np.diag(cov))
    assert np.abs(s.mean(0) / sd).max() < 0.05
    np.testing.assert_allclose(s.std(0), sd, rtol=0.05)
    corr_want = cov / np.outer(sd, sd)
    np.testing.assert_allclose(np.corrcoef(s.T), corr_want, atol=0.05)
    assert float(np.asarray(stats["divergences"]).mean()) < 0.001


def test_ghmc_pipeline_funnel_ncp():
    """inference='ghmc' end to end through run_experiment."""
    from autoreparam_tpu.inference import run_experiment
    from autoreparam_tpu.models import get_model

    res = run_experiment(get_model("neals_funnel"), method="ncp",
                         inference="ghmc", num_chains=64,
                         num_warmup=1000, num_samples=3000, seed=0)
    names = list(res.summary["param_names"])
    iv = names.index("v")
    assert abs(res.summary["mean"][iv]) < 0.25
    assert abs(res.summary["std"][iv] - 3.0) < 0.3
    assert res.summary["rhat_max"] < 1.05
    # one gradient per kept sample feeds the ESS/grad accounting
    assert int(res.stats["num_grad_evals_per_sample"]) == 1


def test_ghmc_step_mult_freeze_gate():
    """The warmup backoff multiplier carries into sampling ONLY when
    the warmup diagnoses the raw MEADS ε as grossly conservative
    (ensemble median mult > 4; inference/ghmc.run_ghmc) — measured
    both ways on real models: freezing a healthy target's ~1.7x
    equilibrium mult cost 20x ess/grad, while election88-NCP's raw ε
    self-locks (ess_min = C/2) without the frozen mult.  Here: a
    healthy Gaussian gates OFF (mult == 1); an explicit step_mult
    passed to sample_ghmc scales the first sweep's reported step size
    exactly (the frozen-kernel contract)."""
    from autoreparam_tpu.inference.ghmc import (_FoldAdapt, sample_ghmc)

    D, C = 4, 32
    pot = lambda z: 0.5 * jnp.sum(z * z)  # noqa: E731
    init = jax.random.normal(jax.random.PRNGKey(0), (C, D))
    cfg = GHMCConfig(num_warmup=500, num_samples=50)
    _, stats = jax.jit(lambda i, k: run_ghmc(pot, i, k, cfg))(
        init, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(stats["step_mult"]),
                                  np.ones((C,), np.float32))

    st = stats["final_state"]
    ad = stats["final_adapt"]
    key = jax.random.PRNGKey(2)

    def first_step_sizes(mult):
        _, _, _, info = sample_ghmc(pot, st, ad, key, 1, cfg,
                                    step_mult=mult)
        return np.asarray(info["step_size"][0])

    # only fold 0's first call sees identical fold stats in both runs
    # (later folds' ε derives from neighbor folds that already moved
    # differently under the scaled step), so the exact-2x contract is
    # asserted there
    N = C // cfg.num_folds
    base = first_step_sizes(None)
    doubled = first_step_sizes(2.0 * jnp.ones((C,)))
    np.testing.assert_allclose(doubled[:N], 2.0 * base[:N], rtol=1e-6)
