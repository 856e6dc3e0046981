"""Sharded execution on the 8-virtual-device CPU mesh
(SURVEY.md §5 item 4: distributed-without-a-cluster)."""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu.inference import (HMCConfig, effective_sample_size,
                                       potential_scale_reduction, run_hmc)
from autoreparam_tpu.parallel import (make_mesh, run_hmc_sharded,
                                      run_nuts_sharded,
                                      sharded_effective_sample_size,
                                      sharded_mean,
                                      sharded_potential_scale_reduction,
                                      shard_chains)


def quad_pot(z):
    return 0.5 * jnp.sum(z ** 2)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["chains"] == 8


def test_sharded_diagnostics_match_unsharded():
    mesh = make_mesh()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (400, 16, 3))
    want_ess = np.asarray(effective_sample_size(x))
    want_rhat = np.asarray(potential_scale_reduction(x))
    xs = shard_chains(mesh, x, axis=1)
    got_ess = np.asarray(sharded_effective_sample_size(xs, mesh))
    got_rhat = np.asarray(sharded_potential_scale_reduction(xs, mesh))
    np.testing.assert_allclose(got_ess, want_ess, rtol=1e-3)
    np.testing.assert_allclose(got_rhat, want_rhat, rtol=1e-4)


def test_sharded_mean():
    mesh = make_mesh()
    x = jnp.arange(32.0).reshape(32, 1)
    xs = shard_chains(mesh, x, axis=0)
    got = float(np.asarray(sharded_mean(xs, mesh))[0])
    np.testing.assert_allclose(got, 15.5, rtol=1e-6)


def test_sharded_hmc_runs_and_matches_moments():
    mesh = make_mesh()
    C = 32  # 4 chains per device
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (C, 2))
    cfg = HMCConfig(num_warmup=150, num_samples=150, num_leapfrog_steps=6,
                    init_step_size=0.3)
    samples, stats = run_hmc_sharded(quad_pot, init, key, cfg, mesh)
    assert samples.shape == (150, C, 2)
    # sharded samples → pooled diagnostics without host gather
    ess = np.asarray(sharded_effective_sample_size(samples, mesh))
    assert np.all(ess > 50)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.std(0), [1.0, 1.0], rtol=0.15)


def test_sharded_equals_unsharded_statistically():
    """Same key, sharded vs single-device: identical program up to XLA
    fusion/reassociation.  HMC is chaotic, so bitwise equality is not a
    valid contract (a 1-ulp fusion difference flips accept decisions
    late in the run); the contract is distributional agreement."""
    mesh = make_mesh()
    C = 16
    key = jax.random.PRNGKey(3)
    init = jax.random.normal(key, (C, 2))
    cfg = HMCConfig(num_warmup=100, num_samples=150, num_leapfrog_steps=4)
    s1, _ = run_hmc(quad_pot, init, key, cfg)
    s2, _ = run_hmc_sharded(quad_pot, init, key, cfg, mesh)
    f1 = np.asarray(s1).reshape(-1, 2)
    f2 = np.asarray(s2).reshape(-1, 2)
    np.testing.assert_allclose(f1.mean(0), f2.mean(0), atol=0.12)
    np.testing.assert_allclose(f1.std(0), f2.std(0), rtol=0.12)


def test_sharded_nuts_runs():
    mesh = make_mesh()
    C = 16
    key = jax.random.PRNGKey(1)
    init = jax.random.normal(key, (C, 2))
    samples, stats = run_nuts_sharded(quad_pot, init, key, mesh,
                                      num_warmup=100, num_samples=100,
                                      max_tree_depth=5)
    assert samples.shape == (100, C, 2)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.std(0), [1.0, 1.0], rtol=0.2)


def test_pipeline_shard_flag():
    """run_experiment(shard=True) routes through the mesh runners."""
    from autoreparam_tpu.inference.pipeline import run_experiment
    from autoreparam_tpu.models import get_model

    res = run_experiment(get_model("neals_funnel"), method="ncp",
                         inference="hmc", num_chains=16, num_warmup=60,
                         num_samples=60, num_leapfrog_steps=4, seed=0,
                         shard=True)
    assert np.isfinite(res.summary["ess_min"])
    assert res.summary["rhat_max"] < 2.0


def test_sharded_interleaved_runs():
    """iHMC over the chain mesh (the reference's best method on
    german_credit was previously capped at unsharded scale)."""
    from autoreparam_tpu.core.messenger import sample
    from autoreparam_tpu import dists as d
    from autoreparam_tpu.parallel import run_interleaved_sharded

    y = jnp.asarray([0.3, -0.2, 0.9, 0.4])

    def hier(y):
        mu = sample("mu", d.Normal(0.0, 2.0))
        tau = sample("tau", d.LogNormal(0.0, 1.0))
        theta = sample("theta", d.Normal(mu, tau), sample_shape=(4,))
        sample("obs", d.Normal(theta, 0.5), obs=y)

    mesh = make_mesh()
    C = 16
    key = jax.random.PRNGKey(5)
    init = 0.3 * jax.random.normal(key, (C, 6))
    cfg = HMCConfig(num_warmup=150, num_samples=150,
                    num_leapfrog_steps=4)
    samples, stats = run_interleaved_sharded(hier, init, key, cfg, mesh,
                                             model_args=(y,))
    assert samples.shape == (150, C, 6)
    assert np.all(np.isfinite(np.asarray(samples)))
    # posterior mean of mu agrees with an unsharded run
    from autoreparam_tpu.inference.interleaved import run_interleaved_hmc
    s2, _ = run_interleaved_hmc(hier, init, key, cfg, model_args=(y,))
    m1 = np.asarray(samples).reshape(-1, 6).mean(0)
    m2 = np.asarray(s2).reshape(-1, 6).mean(0)
    np.testing.assert_allclose(m1, m2, atol=0.25)


def test_sharded_interleaved_pooled_jitter_and_rescue():
    """Pooled-warmup iHMC mitigations (VERDICT r3 task 8): knob parity
    with HMC/NUTS/ChEES/GHMC — sampling-phase step jitter on both inner
    kernels and end-of-warmup stuck-chain rescue, flowing through the
    sharded runner.  Correctness contract: invariance holds for any
    fixed ε per transition, so pooled+jitter must still recover the
    posterior; the rescue mask is part of stats."""
    from autoreparam_tpu.core.messenger import sample
    from autoreparam_tpu import dists as d
    from autoreparam_tpu.parallel import run_interleaved_sharded
    from autoreparam_tpu.inference.interleaved import run_interleaved_hmc

    y = jnp.asarray([0.3, -0.2, 0.9, 0.4])

    def hier(y):
        mu = sample("mu", d.Normal(0.0, 2.0))
        tau = sample("tau", d.LogNormal(0.0, 1.0))
        theta = sample("theta", d.Normal(mu, tau), sample_shape=(4,))
        sample("obs", d.Normal(theta, 0.5), obs=y)

    mesh = make_mesh()
    C = 16
    key = jax.random.PRNGKey(9)
    init = 0.3 * jax.random.normal(key, (C, 6))
    cfg = HMCConfig(num_warmup=150, num_samples=150,
                    num_leapfrog_steps=4, share_adaptation=True,
                    step_jitter=0.2)
    samples, stats = run_interleaved_sharded(hier, init, key, cfg, mesh,
                                             model_args=(y,))
    assert samples.shape == (150, C, 6)
    assert stats["rescued_chains"].shape == (C,)
    ss = np.asarray(stats["step_size_cp"])
    np.testing.assert_allclose(ss, ss[0])  # pooled base step: identical
    # posterior agrees with the unsharded per-chain-adaptation run
    s2, _ = run_interleaved_hmc(
        hier, init, key, cfg._replace(share_adaptation=False),
        model_args=(y,))
    m1 = np.asarray(samples).reshape(-1, 6).mean(0)
    m2 = np.asarray(s2).reshape(-1, 6).mean(0)
    np.testing.assert_allclose(m1, m2, atol=0.25)
    # jitter off vs on: different trajectories, same posterior
    s3, _ = run_interleaved_hmc(hier, init, key,
                                cfg._replace(step_jitter=0.0),
                                model_args=(y,))
    assert not np.allclose(np.asarray(s3), np.asarray(samples))
    np.testing.assert_allclose(
        np.asarray(s3).reshape(-1, 6).mean(0), m1, atol=0.25)


def test_nuts_pooled_adaptation():
    """run_nuts(share_adaptation=True): pooled warmup converges on the
    funnel-NCP-like quadratic and yields one shared step size."""
    from autoreparam_tpu.inference.nuts import run_nuts

    C = 16
    key = jax.random.PRNGKey(6)
    init = jax.random.normal(key, (C, 3))
    samples, stats = run_nuts(quad_pot, init, key, num_warmup=150,
                              num_samples=150, max_tree_depth=5,
                              share_adaptation=True)
    ss = np.asarray(stats["step_size"])
    np.testing.assert_allclose(ss, ss[0])  # pooled: identical per chain
    flat = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(flat.std(0), np.ones(3), rtol=0.2)
    ess = np.asarray(effective_sample_size(samples))
    assert np.all(ess > 100)


def test_nuts_pooled_step_jitter():
    """Pooled-step NUTS mitigations (VERDICT r2 task 2): per-chain
    sampling-phase step jitter + selectable pooled acceptance stat,
    mirroring HMCConfig.step_jitter/pooled_accept_stat.  The jitter
    must not perturb correctness (invariance holds for any fixed ε per
    transition), and the knobs must flow through the sharded runner."""
    from autoreparam_tpu.inference.nuts import run_nuts

    mesh = make_mesh()
    C = 16
    key = jax.random.PRNGKey(8)
    init = jax.random.normal(key, (C, 3))
    kw = dict(num_warmup=150, num_samples=150, max_tree_depth=5,
              share_adaptation=True, step_jitter=0.2,
              pooled_accept_stat="geom")
    samples, stats = run_nuts_sharded(quad_pot, init, key, mesh, **kw)
    ss = np.asarray(stats["step_size"])
    np.testing.assert_allclose(ss, ss[0])  # pooled base step: identical
    flat = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(flat.std(0), np.ones(3), rtol=0.2)
    np.testing.assert_allclose(flat.mean(0), np.zeros(3), atol=0.15)
    # jitter off vs on: both converge; the knob changes the trajectory
    s2, _ = run_nuts(quad_pot, init, key, **{**kw, "step_jitter": 0.0})
    assert not np.allclose(np.asarray(s2), np.asarray(samples))
    np.testing.assert_allclose(np.asarray(s2).reshape(-1, 3).std(0),
                               np.ones(3), rtol=0.2)


def test_sharded_chees_runs():
    from autoreparam_tpu.inference.chees import CheesConfig
    from autoreparam_tpu.parallel import run_chees_sharded

    mesh = make_mesh()
    C = 16
    key = jax.random.PRNGKey(4)
    init = jax.random.normal(key, (C, 2))
    cfg = CheesConfig(num_warmup=100, num_samples=100,
                      max_leapfrog_steps=32)
    samples, stats = run_chees_sharded(quad_pot, init, key, mesh,
                                       config=cfg)
    assert samples.shape == (100, C, 2)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.std(0), [1.0, 1.0], rtol=0.25)


def test_hierarchical_dcn_mesh():
    """Pod-spanning scale-out path: a 2-D ('dcn', 'chains') mesh (2
    slices x 4 devices) must run the same sharded code — chains shard
    over the product axis, pooled moments psum hierarchically (ICI
    within a slice, DCN across; SURVEY.md §3.4)."""
    from autoreparam_tpu.parallel import make_mesh_hierarchical

    mesh = make_mesh_hierarchical(2)
    assert mesh.axis_names == ("dcn", "chains")
    assert mesh.shape["dcn"] == 2 and mesh.shape["chains"] == 4

    # diagnostics match the unsharded reference values
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (400, 16, 3))
    want_ess = np.asarray(effective_sample_size(x))
    want_rhat = np.asarray(potential_scale_reduction(x))
    xs = shard_chains(mesh, x, axis=1)
    np.testing.assert_allclose(
        np.asarray(sharded_effective_sample_size(xs, mesh)),
        want_ess, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(sharded_potential_scale_reduction(xs, mesh)),
        want_rhat, rtol=1e-4)

    # a sampler runs end to end on the hierarchical mesh
    C = 32
    init = jax.random.normal(key, (C, 2))
    cfg = HMCConfig(num_warmup=100, num_samples=100,
                    num_leapfrog_steps=6, init_step_size=0.3)
    samples, stats = run_hmc_sharded(quad_pot, init, key, cfg, mesh)
    assert samples.shape == (100, C, 2)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.std(0), [1.0, 1.0], rtol=0.15)

    import pytest
    with pytest.raises(ValueError, match="divisible"):
        make_mesh_hierarchical(3)


def test_sharded_ghmc_runs_and_matches_local():
    """run_ghmc over the chain mesh: fold-statistic reductions (ensemble
    means/variances, power-iteration matvecs) lower to psums over the
    sharded chain axis; the result must match the local run (same keys,
    same fold layout — only reduction order differs)."""
    from autoreparam_tpu.inference.ghmc import GHMCConfig, run_ghmc
    from autoreparam_tpu.parallel import run_ghmc_sharded

    mesh = make_mesh()
    C = 32
    key = jax.random.PRNGKey(5)
    init = 0.5 * jax.random.normal(key, (C, 2))
    cfg = GHMCConfig(num_warmup=200, num_samples=300)
    s_shard, _ = run_ghmc_sharded(quad_pot, init, key, mesh, config=cfg)
    s_local, _ = run_ghmc(quad_pot, init, key, cfg)
    assert s_shard.shape == (300, C, 2)
    np.testing.assert_allclose(np.asarray(s_shard), np.asarray(s_local),
                               rtol=2e-3, atol=2e-3)
    flat = np.asarray(s_shard).reshape(-1, 2)
    np.testing.assert_allclose(flat.std(0), [1.0, 1.0], rtol=0.2)


def test_sharded_nested_rhat_matches_unsharded():
    from autoreparam_tpu.parallel import sharded_nested_rhat
    from autoreparam_tpu.inference.diagnostics import nested_rhat
    mesh = make_mesh()
    key = jax.random.PRNGKey(11)
    # offset superchains so nR-hat is well above 1 (a real signal, not
    # just noise-floor agreement)
    x = jax.random.normal(key, (50, 32, 2)) * 0.3
    offs = jnp.repeat(jnp.linspace(-1.0, 1.0, 8), 4)
    x = x + offs[None, :, None]
    want = np.asarray(nested_rhat(x, num_superchains=8))
    xs = shard_chains(mesh, x, axis=1)
    got = np.asarray(sharded_nested_rhat(xs, mesh,
                                         superchains_per_device=1))
    assert want.min() > 1.3
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # 2 superchains per device: K=16
    want16 = np.asarray(nested_rhat(x, num_superchains=16))
    got16 = np.asarray(sharded_nested_rhat(xs, mesh,
                                           superchains_per_device=2))
    np.testing.assert_allclose(got16, want16, rtol=1e-5)
