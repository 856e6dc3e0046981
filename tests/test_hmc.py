"""HMC engine tests: energy conservation, dual averaging, posterior
correctness on Gaussian targets (SURVEY.md §5 items 1-2)."""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu.inference import hmc as H


def quad_potential(z):
    return 0.5 * jnp.sum(z ** 2)


def test_leapfrog_energy_conservation():
    """Symplectic integrator on a quadratic potential: energy error stays
    bounded (no drift) over many steps at small eps."""
    z0 = jnp.asarray([1.0, -0.5, 2.0])
    r0 = jnp.asarray([0.3, 0.7, -1.2])
    pg = jax.value_and_grad(quad_potential)
    _, g0 = pg(z0)
    e0 = quad_potential(z0) + 0.5 * jnp.sum(r0 ** 2)
    z, r, pot, _ = H.leapfrog(pg, z0, r0, g0, 0.01,
                              jnp.ones(3), 1000)
    e1 = pot + 0.5 * jnp.sum(r ** 2)
    assert abs(float(e1 - e0)) < 1e-3


def test_leapfrog_reversibility():
    """Run forward, flip momentum, run back: recover the start point
    (detailed-balance smoke, SURVEY.md §5 item 1)."""
    z0 = jnp.asarray([1.0, -0.5, 2.0])
    r0 = jnp.asarray([0.3, 0.7, -1.2])
    pg = jax.value_and_grad(quad_potential)
    _, g0 = pg(z0)
    z1, r1, _, g1 = H.leapfrog(pg, z0, r0, g0, 0.05, jnp.ones(3), 50)
    z2, r2, _, _ = H.leapfrog(pg, z1, -r1, g1, 0.05, jnp.ones(3), 50)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(-r2), np.asarray(r0), atol=1e-4)


def test_warmup_schedule():
    is_slow, is_end = H.warmup_schedule(1000)
    assert is_slow.shape == (1000,)
    assert not is_slow[:75].any()          # init buffer fast
    assert not is_slow[-50:].any()         # term buffer fast
    assert is_slow[75:950].all()           # slow windows cover the middle
    ends = np.nonzero(is_end)[0]
    assert ends[-1] == 949                 # last window ends before term
    assert len(ends) >= 3                  # expanding windows

    # degenerate: tiny warmup still works
    s2, e2 = H.warmup_schedule(20)
    assert s2.shape == (20,)


def test_hmc_standard_normal_posterior():
    """Sampling N(0, diag(1, 4)) must recover mean/var within MC error."""
    def pot(z):
        return 0.5 * (z[0] ** 2 + z[1] ** 2 / 4.0)

    C = 32
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (C, 2))
    cfg = H.HMCConfig(num_warmup=300, num_samples=300,
                      num_leapfrog_steps=8, init_step_size=0.2)
    samples, stats = jax.jit(
        lambda i, k: H.run_hmc(pot, i, k, cfg))(init, key)
    assert samples.shape == (300, C, 2)
    flat = np.asarray(samples).reshape(-1, 2)
    n_eff_guess = 2000.0  # conservative
    se_mean = np.array([1.0, 2.0]) / np.sqrt(n_eff_guess)
    assert np.all(np.abs(flat.mean(0)) < 5 * se_mean)
    np.testing.assert_allclose(flat.std(0), [1.0, 2.0], rtol=0.15)
    # mass adaptation should have learned the scales
    learned = np.asarray(stats["inv_mass_diag"]).mean(0)
    np.testing.assert_allclose(learned, [1.0, 4.0], rtol=0.5)
    # dual averaging should hit the target acceptance on average
    acc = float(np.asarray(stats["accept_prob"]).mean())
    assert 0.6 < acc < 0.95


def test_hmc_is_deterministic_given_key():
    def pot(z):
        return 0.5 * jnp.sum(z ** 2)

    init = jnp.ones((4, 3))
    cfg = H.HMCConfig(num_warmup=50, num_samples=50, num_leapfrog_steps=4)
    s1, _ = H.run_hmc(pot, init, jax.random.PRNGKey(5), cfg)
    s2, _ = H.run_hmc(pot, init, jax.random.PRNGKey(5), cfg)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_hmc_shared_adaptation():
    """Pooled cross-chain adaptation: one ensemble-driven step size +
    mass; must recover the target and learn the scales at least as well
    as per-chain adaptation."""
    def pot(z):
        return 0.5 * (z[0] ** 2 + z[1] ** 2 / 4.0)

    C = 32
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (C, 2))
    cfg = H.HMCConfig(num_warmup=300, num_samples=300,
                      num_leapfrog_steps=8, init_step_size=0.2,
                      share_adaptation=True)
    samples, stats = H.run_hmc(pot, init, key, cfg)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.std(0), [1.0, 2.0], rtol=0.15)
    learned = np.asarray(stats["inv_mass_diag"]).mean(0)
    np.testing.assert_allclose(learned, [1.0, 4.0], rtol=0.35)
    # shared step size: all chains identical
    ss = np.asarray(stats["step_size"])
    np.testing.assert_allclose(ss, ss[0], rtol=1e-5)
    acc = float(np.asarray(stats["accept_prob"]).mean())
    assert 0.6 < acc < 0.98


def test_rescue_stuck_chains():
    """A chain with ~zero warmup-tail acceptance is teleported to a
    healthy donor position; healthy chains are untouched (pooled step
    sizes have no per-chain escape hatch — eight_schools NCP showed one
    chain at 0.00 acceptance among 31 at 0.99, R-hat 292)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from autoreparam_tpu.inference.hmc import (HMCState,
                                               rescue_stuck_chains)

    C, D = 8, 3
    z = jnp.arange(C * D, dtype=jnp.float32).reshape(C, D)
    state = HMCState(z=z, pot=jnp.arange(C, dtype=jnp.float32),
                     grad=z * 2.0)
    warm = jnp.ones((50, C))
    warm = warm.at[:, 3].set(0.001)        # chain 3 is stuck
    new_state, stuck = rescue_stuck_chains(state, warm,
                                           jax.random.PRNGKey(0))
    stuck = np.asarray(stuck)
    assert stuck.tolist() == [False, False, False, True, False, False,
                              False, False]
    # healthy rows identical
    for c in range(C):
        if c == 3:
            continue
        np.testing.assert_array_equal(np.asarray(new_state.z[c]),
                                      np.asarray(z[c]))
    # stuck row replaced by some healthy donor row (consistent tree-wide)
    nz = np.asarray(new_state.z[3])
    donors = [c for c in range(C) if c != 3
              and np.array_equal(nz, np.asarray(z[c]))]
    assert len(donors) == 1, nz
    d = donors[0]
    assert float(new_state.pot[3]) == float(state.pot[d])
    np.testing.assert_array_equal(np.asarray(new_state.grad[3]),
                                  np.asarray(state.grad[d]))
    # zero-warmup: no-op
    s2, st2 = rescue_stuck_chains(state, jnp.zeros((0, C)),
                                  jax.random.PRNGKey(0))
    assert not bool(np.asarray(st2).any())


def test_energy_stats_and_ebfmi():
    """run_hmc emits the post-accept Hamiltonian series; on a standard
    normal target E-BFMI is healthy (~2 for near-iid energies)."""
    from autoreparam_tpu.inference import diagnostics as dg

    def pot(z):
        return 0.5 * jnp.sum(z ** 2)

    key = jax.random.PRNGKey(3)
    z0 = jax.random.normal(key, (8, 4))
    cfg = H.HMCConfig(num_warmup=200, num_samples=300,
                      num_leapfrog_steps=8)
    _, stats = H.run_hmc(pot, z0, jax.random.PRNGKey(4), cfg)
    e = np.asarray(stats["energy"])
    assert e.shape == (300, 8)
    assert np.all(np.isfinite(e))
    b = np.asarray(dg.ebfmi(stats["energy"]))
    assert np.all(b > 0.5)
