"""VIP/NCP algebra property tests (SURVEY.md §5 item 1, "VIP algebra").

The key invariants, which were the reference's own implicit verification:
- λ=1 recovers CP exactly (same log-joint as the untransformed model,
  after the deterministic change of variables).
- λ=0 recovers NCP exactly.
- The deterministic map round-trips.
- Posterior expectations are invariant across parameterisations (checked
  end-to-end in test_e2e.py; here we check densities pointwise).
"""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu import dists as d
from autoreparam_tpu.core import (get_model_info, log_density,
                                  make_potential_fn, sample, trace, seed,
                                  substitute, handlers)
from autoreparam_tpu.reparam import (aux_name, eligible_sites,
                                     make_ncp_model, make_vip_model,
                                     recover_fn)


def funnel():
    """Neal's funnel: v ~ N(0,3), x ~ N(0, e^{v/2}) elementwise."""
    v = sample("v", d.Normal(0.0, 3.0))
    sample("x", d.Normal(0.0, jnp.exp(v / 2.0)), sample_shape=(9,))


def hier_model(y):
    mu = sample("mu", d.Normal(0.0, 5.0))
    tau = sample("tau", d.HalfCauchy(2.5))
    theta = sample("theta", d.Normal(mu, tau), sample_shape=(4,))
    sample("obs", d.Normal(theta, 1.0), obs=y)


Y = jnp.asarray([1.0, -0.5, 0.3, 2.0])


def test_eligible_sites():
    el = eligible_sites(hier_model, (Y,))
    assert "mu" in el and "theta" in el
    assert el["theta"] == (4,)
    assert "tau" not in el  # HalfCauchy is not loc-scale


def test_ncp_structure():
    ncp = make_ncp_model(hier_model, sites=["theta"], model_args=(Y,))
    info = get_model_info(ncp, (Y,))
    assert aux_name("theta") in info.names
    assert "theta" not in info.names
    assert "mu" in info.names  # untouched


def test_ncp_density():
    """NCP joint: p(mu) p(tau) N(ẑ;0,1) N(y; mu+tau*ẑ, 1)."""
    ncp = make_ncp_model(hier_model, sites=["theta"], model_args=(Y,))
    mu, tau = 0.4, 1.7
    zhat = jnp.asarray([0.3, -1.0, 0.5, 2.0])
    params = {"mu": jnp.float32(mu), "tau": jnp.float32(tau),
              aux_name("theta"): zhat}
    lp, sites = log_density(ncp, (Y,), {}, params)
    theta = mu + tau * np.asarray(zhat)
    import scipy.stats as st
    want = (st.norm(0, 5).logpdf(mu) + st.halfcauchy(scale=2.5).logpdf(tau)
            + st.norm(0, 1).logpdf(np.asarray(zhat)).sum()
            + st.norm(theta, 1).logpdf(np.asarray(Y)).sum())
    np.testing.assert_allclose(float(lp), want, rtol=2e-4)
    # deterministic model-space record exists and is correct
    np.testing.assert_allclose(np.asarray(sites["theta"].value), theta,
                               rtol=1e-5)


def _vip_lp(lam_val, zhat, mu, tau):
    vip = make_vip_model(hier_model,
                         {"theta": jnp.full((4,), lam_val)})
    params = {"mu": jnp.float32(mu), "tau": jnp.float32(tau),
              aux_name("theta"): zhat}
    lp, sites = log_density(vip, (Y,), {}, params)
    return lp, sites


def test_vip_lambda1_is_cp():
    """At λ=1, ẑ = z and the VIP joint equals the CP joint."""
    mu, tau = 0.4, 1.7
    theta = jnp.asarray([0.9, -0.2, 0.5, 1.4])
    lp_vip, sites = _vip_lp(1.0, theta, mu, tau)
    lp_cp, _ = log_density(
        hier_model, (Y,), {},
        {"mu": jnp.float32(mu), "tau": jnp.float32(tau), "theta": theta})
    np.testing.assert_allclose(float(lp_vip), float(lp_cp), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sites["theta"].value),
                               np.asarray(theta), rtol=1e-5)


def test_vip_lambda0_is_ncp():
    mu, tau = -0.3, 0.8
    zhat = jnp.asarray([0.3, -1.0, 0.5, 2.0])
    lp_vip, sites_vip = _vip_lp(0.0, zhat, mu, tau)
    ncp = make_ncp_model(hier_model, sites=["theta"], model_args=(Y,))
    lp_ncp, sites_ncp = log_density(
        ncp, (Y,), {},
        {"mu": jnp.float32(mu), "tau": jnp.float32(tau),
         aux_name("theta"): zhat})
    np.testing.assert_allclose(float(lp_vip), float(lp_ncp), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sites_vip["theta"].value),
                               np.asarray(sites_ncp["theta"].value),
                               rtol=1e-4, atol=1e-5)


def test_vip_roundtrip_deterministic_map():
    """z = μ + σ^{1−λ}(ẑ − λμ)  ⇔  ẑ = λμ + σ^{λ−1}(z − μ)."""
    lam, mu, sigma = 0.37, 1.2, 2.1
    zhat = 0.73
    z = mu + sigma ** (1 - lam) * (zhat - lam * mu)
    zhat_back = lam * mu + sigma ** (lam - 1) * (z - mu)
    np.testing.assert_allclose(zhat_back, zhat, rtol=1e-12)


def test_vip_interpolates_smoothly_and_differentiably():
    zhat = jnp.asarray([0.3, -1.0, 0.5, 2.0])

    def lp_of_lam(lam_scalar):
        vip = make_vip_model(hier_model,
                             {"theta": jnp.full((4,), lam_scalar)})
        lp, _ = log_density(
            vip, (Y,), {},
            {"mu": jnp.float32(0.4), "tau": jnp.float32(1.7),
             aux_name("theta"): zhat})
        return lp

    g = jax.grad(lp_of_lam)(jnp.float32(0.5))
    assert np.isfinite(float(g))
    # finite-difference check
    eps = 1e-3
    fd = (float(lp_of_lam(jnp.float32(0.5 + eps)))
          - float(lp_of_lam(jnp.float32(0.5 - eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=2e-2, atol=2e-2)


def test_lognormal_vip_reparam():
    """LogNormal sites reparameterise in log-space (german_credit
    pattern, BASELINE config #4)."""

    def m(y):
        tau = sample("tau", d.LogNormal(0.0, 1.0))
        sample("obs", d.Normal(0.0, tau), obs=y)

    yv = jnp.asarray([0.2, -0.4])
    vip = make_vip_model(m, {"tau": jnp.float32(0.0)})  # λ=0 → NCP
    info = get_model_info(vip, (yv,))
    assert info.names == (aux_name("tau"),)
    zhat = jnp.float32(0.6)
    lp, sites = log_density(vip, (yv,), {}, {aux_name("tau"): zhat})
    import scipy.stats as st
    tau = np.exp(0.0 + 1.0 * 0.6)
    want = (st.norm(0, 1).logpdf(0.6)
            + st.norm(0, tau).logpdf(np.asarray(yv)).sum())
    np.testing.assert_allclose(float(lp), want, rtol=2e-4)
    np.testing.assert_allclose(float(sites["tau"].value), tau, rtol=1e-5)


def test_funnel_ncp_potential_is_standard_normal():
    """Full-NCP funnel: the transformed target is an iid standard normal
    in (v̂, x̂) — its potential must equal a 10-d standard normal's up to
    a constant."""
    ncp = make_ncp_model(funnel)
    info = get_model_info(ncp)
    assert info.dim == 10
    assert set(info.names) == {aux_name("v"), aux_name("x")}
    pot = make_potential_fn(ncp, info)
    z1 = jax.random.normal(jax.random.PRNGKey(0), (10,))
    z2 = jax.random.normal(jax.random.PRNGKey(1), (10,))
    diff1 = float(pot(z1) - 0.5 * jnp.sum(z1 ** 2))
    diff2 = float(pot(z2) - 0.5 * jnp.sum(z2 ** 2))
    np.testing.assert_allclose(diff1, diff2, rtol=1e-3, atol=1e-3)


def test_recover_fn():
    ncp = make_ncp_model(hier_model, sites=["theta", "mu"],
                         model_args=(Y,))
    info = get_model_info(ncp, (Y,))
    rec = recover_fn(ncp, info, (Y,), log_readout=False)
    flat = jax.random.normal(jax.random.PRNGKey(0), (info.dim,))
    vals = rec(flat)
    assert set(vals) == {"mu", "tau", "theta"}
    assert vals["theta"].shape == (4,)
    # consistency: theta == mu + tau * theta_base
    unc = info.constrain(flat)
    np.testing.assert_allclose(
        np.asarray(vals["theta"]),
        np.asarray(vals["mu"] + vals["tau"] * unc[aux_name("theta")]),
        rtol=1e-5)
    # default log_readout: positive-support sites come back in log space
    # under log(<name>), overflow-free (tau is HalfCauchy -> Exp support)
    rec_log = recover_fn(ncp, info, (Y,))
    vals_log = rec_log(flat)
    assert set(vals_log) == {"mu", "log(tau)", "theta"}
    np.testing.assert_allclose(np.asarray(vals_log["log(tau)"]),
                               np.log(np.asarray(vals["tau"])), rtol=1e-5)
    # a log-space value never overflows even when exp(z) would
    big = flat.at[_tau_index(info)].set(200.0)
    assert np.isfinite(np.asarray(rec_log(big)["log(tau)"]))


def _tau_index(info):
    for s in info.latents:
        if s.name == "tau":
            return s.offset
    raise AssertionError("tau latent not found")


def test_vip_aux_shape_with_sample_shape_sites():
    """Regression: a site with scalar params + sample_shape and an
    elementwise lambda must produce an aux latent of the SITE shape,
    not sample_shape + lambda-batch (was (8,8) for eight_schools)."""
    from autoreparam_tpu.core import get_model_info

    def m(y):
        mu = sample("mu", d.Normal(0.0, 5.0))
        tau = sample("tau", d.HalfNormal(1.0))
        theta = sample("theta", d.Normal(mu, tau), sample_shape=(8,))
        sample("obs", d.Normal(theta, 1.0), obs=y)

    y = jnp.zeros((8,))
    vip = make_vip_model(m, {"theta": jnp.full((8,), 0.3),
                             "mu": jnp.float32(0.7)})
    info = get_model_info(vip, (y,))
    shapes = {s.name: s.shape for s in info.latents}
    assert shapes[aux_name("theta")] == (8,), shapes
    assert shapes[aux_name("mu")] == (), shapes
    assert info.dim == 10
    # scalar (tied) lambda on a sample_shape site also works
    vip2 = make_vip_model(m, {"theta": jnp.float32(0.3)})
    info2 = get_model_info(vip2, (y,))
    shapes2 = {s.name: s.shape for s in info2.latents}
    assert shapes2[aux_name("theta")] == (8,), shapes2


def test_tail_transport_matches_halfcauchy_quantile():
    """transport_from_normal is exactly F⁻¹∘Φ (scipy oracle), stable
    deep into the right tail, with log_value = log(value)."""
    import scipy.stats as st

    z = jnp.asarray([-3.0, -1.0, 0.0, 1.0, 3.0, 6.0], jnp.float32)
    hc = d.HalfCauchy(2.0)
    x, log_x = hc.transport_from_normal(z)
    want = st.halfcauchy.ppf(st.norm.cdf(np.asarray(z, np.float64)),
                             scale=2.0)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(log_x), np.log(want), rtol=1e-4)
    # gradient is finite everywhere probed
    g = jax.vmap(jax.grad(lambda zz: hc.transport_from_normal(zz)[1]))(z)
    assert np.all(np.isfinite(np.asarray(g)))


def test_tail_transport_model_structure_and_posterior():
    """make_tail_transport_model replaces a HalfCauchy site with a
    standard-normal aux + deterministic record; the posterior over the
    model-space coordinates is unchanged (same model, different
    coordinates)."""
    from autoreparam_tpu.reparam import (make_tail_transport_model,
                                         transport_sites, eligible_sites)
    from autoreparam_tpu.inference import HMCConfig, run_hmc
    from autoreparam_tpu.core import get_model_info, make_potential_fn
    from autoreparam_tpu.reparam.handler import recover_fn

    y = jnp.asarray([0.5, -0.3, 1.2, 0.8, -0.1, 0.4], jnp.float32)

    def m(y):
        mu = sample("mu", d.Normal(0.0, 2.0))
        tau = sample("tau", d.HalfCauchy(1.0))
        sample("obs", d.Normal(mu, tau), obs=y)

    assert list(transport_sites(m, (y,))) == ["tau"]
    tm = make_tail_transport_model(m, model_args=(y,))
    # the transport aux must NOT look NCP/VIP-eligible
    assert aux_name("tau") not in eligible_sites(tm, (y,))
    assert "mu" in eligible_sites(tm, (y,))

    def run(model):
        info = get_model_info(model, (y,))
        pot = make_potential_fn(model, info, (y,))
        collect = recover_fn(model, info, (y,))
        key = jax.random.PRNGKey(0)
        init = 0.3 * jax.random.normal(key, (16, info.dim))
        cfg = HMCConfig(num_warmup=400, num_samples=400,
                        num_leapfrog_steps=8)
        samples, _ = run_hmc(pot, init, key, cfg, collect_fn=collect)
        return {k: float(np.asarray(v).mean()) for k, v in samples.items()}

    base = run(m)
    trans = run(tm)
    assert set(base) == set(trans) == {"mu", "log(tau)"}
    np.testing.assert_allclose(trans["mu"], base["mu"], atol=0.1)
    np.testing.assert_allclose(trans["log(tau)"], base["log(tau)"],
                               atol=0.15)
