"""Interleaved HMC: exact coordinate-map round trips + sampling smoke
(SURVEY.md §4.3; BASELINE config #4 pattern)."""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu import dists as d
from autoreparam_tpu.core import get_model_info, sample
from autoreparam_tpu.inference import HMCConfig
from autoreparam_tpu.inference.interleaved import (make_coordinate_maps,
                                                   run_interleaved_hmc)
from autoreparam_tpu.reparam import make_ncp_model


def hier_model(y):
    mu = sample("mu", d.Normal(0.0, 5.0))
    tau = sample("tau", d.LogNormal(0.0, 1.0))
    theta = sample("theta", d.Normal(mu, tau), sample_shape=(4,))
    sample("obs", d.Normal(theta, 1.0), obs=y)


Y = jnp.asarray([1.0, -0.5, 0.3, 2.0])


def _build():
    ncp_sites = ["theta", "tau"]
    ncp = make_ncp_model(hier_model, sites=ncp_sites, model_args=(Y,))
    info_cp = get_model_info(hier_model, (Y,))
    info_ncp = get_model_info(ncp, (Y,))
    maps = make_coordinate_maps(hier_model, ncp, info_cp, info_ncp,
                                ncp_sites, (Y,))
    return info_cp, info_ncp, maps


def test_coordinate_maps_roundtrip():
    info_cp, info_ncp, (to_ncp, to_cp) = _build()
    assert info_cp.dim == info_ncp.dim == 6
    z = jax.random.normal(jax.random.PRNGKey(0), (6,))
    z_ncp = to_ncp(z)
    z_back = to_cp(z_ncp)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z),
                               rtol=1e-4, atol=1e-4)
    # and the other direction
    z2 = to_ncp(to_cp(z_ncp))
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z_ncp),
                               rtol=1e-4, atol=1e-4)


def test_coordinate_maps_are_correct_transform():
    """ẑ_theta = (theta - mu)/tau; ẑ_tau = log(tau) (LogNormal base)."""
    info_cp, info_ncp, (to_ncp, _) = _build()
    vals = {"mu": jnp.float32(0.5), "tau": jnp.float32(2.0),
            "theta": jnp.asarray([1.0, -0.3, 0.8, 2.5])}
    flat_cp = info_cp.unconstrain(vals)
    flat_ncp = to_ncp(flat_cp)
    ncp_vals = info_ncp.unravel(flat_ncp)
    np.testing.assert_allclose(
        np.asarray(ncp_vals["theta::base"]),
        (np.asarray(vals["theta"]) - 0.5) / 2.0, rtol=1e-4)
    np.testing.assert_allclose(float(ncp_vals["tau::base"]),
                               np.log(2.0), rtol=1e-4)
    np.testing.assert_allclose(float(ncp_vals["mu"]), 0.5, rtol=1e-5)


def test_interleaved_hmc_runs_and_mixes():
    key = jax.random.PRNGKey(0)
    C = 8
    info_cp = get_model_info(hier_model, (Y,))
    init = 0.3 * jax.random.normal(key, (C, info_cp.dim))
    cfg = HMCConfig(num_warmup=200, num_samples=200,
                    num_leapfrog_steps=6, init_step_size=0.2)
    samples, stats = run_interleaved_hmc(hier_model, init, key, cfg,
                                         model_args=(Y,))
    assert samples.shape == (200, C, info_cp.dim)
    assert np.all(np.isfinite(np.asarray(samples)))
    # both kernels should be accepting
    assert float(np.asarray(stats["accept_prob_cp"]).mean()) > 0.5
    assert float(np.asarray(stats["accept_prob_ncp"]).mean()) > 0.5
    assert stats["num_grad_evals_per_sample"] == 12
    # posterior mean of mu sane (data mean ~0.7, shrunk)
    off = info_cp.latents[info_cp.names.index("mu")].offset
    mu_mean = float(np.asarray(samples)[..., off].mean())
    assert -1.0 < mu_mean < 2.5
