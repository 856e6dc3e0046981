"""Matrix (Cholesky) NCP/VIP for MultivariateNormal sites.

Beyond the reference (which had no correlated priors): NCP is the
Stan-idiomatic Cholesky non-centering ẑ ~ N(0, I), z = μ + Lẑ; VIP
interpolates the Cholesky factor row-wise (strategies.VIP._apply_matrix)
with the same λ=1 ⇒ CP / λ=0 ⇒ NCP limits as the elementwise path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from autoreparam_tpu import dists as d
from autoreparam_tpu.core import (get_model_info, log_density, sample,
                                  trace, seed, substitute)
from autoreparam_tpu.reparam import (aux_name, eligible_sites,
                                     make_ncp_model, make_vip_model)

L0 = jnp.asarray([[1.0, 0.0, 0.0],
                  [0.5, 0.8, 0.0],
                  [-0.3, 0.2, 0.6]])
Y = jnp.asarray([1.0, -0.5, 0.3])


def corr_model(y):
    """Correlated random effects: z ~ MVN(μ·1, τ·L0), y ~ N(z, 1)."""
    mu = sample("mu", d.Normal(0.0, 5.0))
    tau = sample("tau", d.HalfNormal(2.0))
    z = sample("z", d.MultivariateNormal(mu * jnp.ones(3), tau * L0))
    sample("obs", d.Normal(z, 1.0), obs=y)


def test_mvn_site_is_eligible():
    el = eligible_sites(corr_model, (Y,))
    assert "z" in el and el["z"] == (3,)


def test_matrix_ncp_density():
    """NCP joint: p(μ) p(τ) N(ẑ; 0, I) N(y; μ1 + τL0ẑ, 1)."""
    ncp = make_ncp_model(corr_model, sites=["z"], model_args=(Y,))
    mu, tau = 0.4, 1.3
    zhat = jnp.asarray([0.3, -1.0, 0.5])
    lp, sites = log_density(
        ncp, (Y,), {},
        {"mu": jnp.float32(mu), "tau": jnp.float32(tau),
         aux_name("z"): zhat})
    z = mu + tau * np.asarray(L0) @ np.asarray(zhat)
    want = (st.norm(0, 5).logpdf(mu) + st.halfnorm(scale=2.0).logpdf(tau)
            + st.norm(0, 1).logpdf(np.asarray(zhat)).sum()
            + st.norm(z, 1).logpdf(np.asarray(Y)).sum())
    np.testing.assert_allclose(float(lp), want, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(sites["z"].value), z, rtol=1e-5)


def _vip_lp(lam, zhat, mu, tau):
    vip = make_vip_model(corr_model, {"z": lam})
    return log_density(
        vip, (Y,), {},
        {"mu": jnp.float32(mu), "tau": jnp.float32(tau),
         aux_name("z"): zhat})


def test_matrix_vip_lambda1_is_cp():
    mu, tau = 0.4, 1.3
    z = jnp.asarray([0.9, -0.2, 0.5])
    lp_vip, sites = _vip_lp(jnp.float32(1.0), z, mu, tau)
    lp_cp, _ = log_density(
        corr_model, (Y,), {},
        {"mu": jnp.float32(mu), "tau": jnp.float32(tau), "z": z})
    np.testing.assert_allclose(float(lp_vip), float(lp_cp), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sites["z"].value),
                               np.asarray(z), rtol=1e-5)


def test_matrix_vip_lambda0_is_ncp():
    mu, tau = -0.3, 0.8
    zhat = jnp.asarray([0.3, -1.0, 0.5])
    lp_vip, sites_vip = _vip_lp(jnp.float32(0.0), zhat, mu, tau)
    ncp = make_ncp_model(corr_model, sites=["z"], model_args=(Y,))
    lp_ncp, sites_ncp = log_density(
        ncp, (Y,), {},
        {"mu": jnp.float32(mu), "tau": jnp.float32(tau),
         aux_name("z"): zhat})
    np.testing.assert_allclose(float(lp_vip), float(lp_ncp), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sites_vip["z"].value),
                               np.asarray(sites_ncp["z"].value),
                               rtol=1e-4, atol=1e-5)


def test_matrix_vip_mid_lambda_pushforward_distribution():
    """At any λ the deterministic map must push the aux prior forward to
    the SAME model-space law: z | μ,τ ~ MVN(μ1, τ²L0L0ᵀ).  Checked by
    moments at λ=0.5 with an elementwise (per-row) λ."""
    lam = jnp.asarray([0.5, 0.2, 0.8])
    vip = make_vip_model(corr_model, {"z": lam})
    mu, tau = 0.4, 1.3
    fixed = substitute(vip, data={"mu": jnp.float32(mu),
                                  "tau": jnp.float32(tau)})

    def draw(key):
        tr = trace(seed(fixed, key=key)).get_trace(Y)
        return tr["z"].value

    zs = jax.vmap(draw)(jax.random.split(jax.random.PRNGKey(0), 40000))
    zs = np.asarray(zs)
    cov_want = tau ** 2 * np.asarray(L0) @ np.asarray(L0).T
    np.testing.assert_allclose(zs.mean(0), mu * np.ones(3), atol=0.03)
    np.testing.assert_allclose(np.cov(zs.T), cov_want, atol=0.05)


def test_matrix_vip_lambda_gradient():
    zhat = jnp.asarray([0.3, -1.0, 0.5])

    def lp_of_lam(lam_scalar):
        lp, _ = _vip_lp(lam_scalar, zhat, 0.4, 1.3)
        return lp

    g = jax.grad(lp_of_lam)(jnp.float32(0.5))
    assert np.isfinite(float(g))
    eps = 1e-3
    fd = (float(lp_of_lam(jnp.float32(0.5 + eps)))
          - float(lp_of_lam(jnp.float32(0.5 - eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=2e-2, atol=2e-2)


def test_matrix_vip_vi_learns_lambda():
    """The joint (q, λ) ELBO runs end-to-end on a matrix site and keeps
    λ inside [0,1] (smoke at a small step budget)."""
    from autoreparam_tpu.inference.vi import fit_vi

    res = fit_vi(corr_model, model_args=(Y,),
                 vip_sites=("z",), num_steps=200,
                 key=jax.random.PRNGKey(0))
    lam = np.asarray(res.lam["z"])
    assert lam.shape == (3,)
    assert np.all((lam >= 0.0) & (lam <= 1.0))
    assert np.isfinite(float(res.elbo_trace[-1]))


def test_matrix_ncp_hmc_posterior():
    """Conjugate check: with τ fixed (observed), μ fixed, the posterior
    over z is Gaussian with precision Σ⁻¹ + I and mean
    (Σ⁻¹ + I)⁻¹(Σ⁻¹μ1 + y).  NCP-HMC must recover it."""
    from autoreparam_tpu.inference.hmc import HMCConfig, run_hmc
    from autoreparam_tpu.core import make_potential_fn
    from autoreparam_tpu.reparam import recover_fn

    mu, tau = 0.4, 1.3

    def m(y):
        z = sample("z", d.MultivariateNormal(mu * jnp.ones(3), tau * L0))
        sample("obs", d.Normal(z, 1.0), obs=y)

    ncp = make_ncp_model(m, model_args=(Y,))
    info = get_model_info(ncp, (Y,))
    assert info.names == (aux_name("z"),)
    pot = make_potential_fn(ncp, info, (Y,))
    cfg = HMCConfig(num_warmup=500, num_samples=1000,
                    num_leapfrog_steps=8)
    init = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (128, info.dim))
    samples, _ = run_hmc(pot, init, jax.random.PRNGKey(1), cfg)
    rec = jax.vmap(jax.vmap(recover_fn(ncp, info, (Y,))))
    z = np.asarray(rec(samples)["z"]).reshape(-1, 3)
    cov_p = tau ** 2 * np.asarray(L0) @ np.asarray(L0).T
    prec = np.linalg.inv(cov_p) + np.eye(3)
    post_cov = np.linalg.inv(prec)
    post_mean = post_cov @ (np.linalg.inv(cov_p) @ (mu * np.ones(3))
                            + np.asarray(Y))
    np.testing.assert_allclose(z.mean(0), post_mean, atol=0.05)
    np.testing.assert_allclose(np.cov(z.T), post_cov, atol=0.08)
