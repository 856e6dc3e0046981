"""Checkpoint/resume: a preempted run continues identically
(SURVEY.md §6 "Checkpoint / resume")."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu.inference import HMCConfig
from autoreparam_tpu.utils.checkpoint import ResumableHMC


def pot(z):
    return 0.5 * jnp.sum(z ** 2)


def test_resumable_hmc_completes_and_resumes(tmp_path):
    cfg = HMCConfig(num_warmup=100, num_samples=0, num_leapfrog_steps=4,
                    init_step_size=0.3)
    C, D = 8, 2
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (C, D))

    # full run: 3 chunks of 50
    d1 = str(tmp_path / "full")
    r1 = ResumableHMC(pot, cfg, d1, chunk_size=50)
    s_full = r1.run(init, key, num_samples=150)
    assert s_full.shape == (150, C, D)

    # interrupted run: stop after 1 chunk (simulated by asking for 50),
    # then resume to 150 with a fresh object (new process semantics)
    d2 = str(tmp_path / "resumed")
    r2a = ResumableHMC(pot, cfg, d2, chunk_size=50)
    s_part = r2a.run(init, key, num_samples=50)
    assert s_part.shape == (50, C, D)
    r2b = ResumableHMC(pot, cfg, d2, chunk_size=50)
    s_res = r2b.run(init, key, num_samples=150)
    assert s_res.shape == (150, C, D)
    # the resumed run reuses chunk 0 byte-for-byte (no recomputation)
    np.testing.assert_array_equal(s_res[:50], s_part)
    # and the result is statistically sane
    flat = s_res.reshape(-1, D)
    np.testing.assert_allclose(flat.std(0), [1.0, 1.0], rtol=0.25)
    # warmup was not redone on resume: state dir has >= 2 checkpoints
    assert os.path.isdir(os.path.join(d2, "state"))


def test_resumable_nuts_completes_and_resumes(tmp_path):
    """A preempted NUTS run resumes without redoing warmup and
    reproduces the uninterrupted run (VERDICT r2 task 7: NUTS/ChEES
    are the configs that actually run long at 8192 chains)."""
    from autoreparam_tpu.utils.checkpoint import ResumableNUTS

    C, D = 8, 2
    key = jax.random.PRNGKey(1)
    init = jax.random.normal(key, (C, D))
    kw = dict(num_warmup=100, max_tree_depth=4, init_step_size=0.3,
              share_adaptation=True)

    d1 = str(tmp_path / "full")
    s_full = ResumableNUTS(pot, d1, chunk_size=50, **kw).run(
        init, key, num_samples=150)
    assert s_full.shape == (150, C, D)

    d2 = str(tmp_path / "resumed")
    s_part = ResumableNUTS(pot, d2, chunk_size=50, **kw).run(
        init, key, num_samples=50)
    s_res = ResumableNUTS(pot, d2, chunk_size=50, **kw).run(
        init, key, num_samples=150)
    np.testing.assert_array_equal(s_res[:50], s_part)
    # identical key chain + adapted state => identical trajectory
    np.testing.assert_array_equal(s_res, s_full)
    flat = s_res.reshape(-1, D)
    np.testing.assert_allclose(flat.std(0), [1.0, 1.0], rtol=0.25)


def test_resumable_chees_completes_and_resumes(tmp_path):
    """ChEES resume continues the run-global Halton jitter sequence at
    the correct offset, so interrupted == uninterrupted."""
    from autoreparam_tpu.inference.chees import CheesConfig
    from autoreparam_tpu.utils.checkpoint import ResumableChEES

    C, D = 8, 2
    key = jax.random.PRNGKey(2)
    init = jax.random.normal(key, (C, D))
    cfg = CheesConfig(num_warmup=100, max_leapfrog_steps=32)

    d1 = str(tmp_path / "full")
    s_full = ResumableChEES(pot, cfg, d1, chunk_size=50).run(
        init, key, num_samples=150)
    assert s_full.shape == (150, C, D)

    d2 = str(tmp_path / "resumed")
    s_part = ResumableChEES(pot, cfg, d2, chunk_size=50).run(
        init, key, num_samples=50)
    s_res = ResumableChEES(pot, cfg, d2, chunk_size=50).run(
        init, key, num_samples=150)
    np.testing.assert_array_equal(s_res[:50], s_part)
    np.testing.assert_array_equal(s_res, s_full)
    flat = s_res.reshape(-1, D)
    np.testing.assert_allclose(flat.std(0), [1.0, 1.0], rtol=0.25)


def test_resumable_ghmc_completes_and_resumes(tmp_path):
    """Interrupted + resumed GHMC reproduces the uninterrupted run,
    INCLUDING the continuously-adapting fold state (persisted per
    chunk)."""
    import jax.numpy as jnp

    from autoreparam_tpu.inference.ghmc import GHMCConfig
    from autoreparam_tpu.utils.checkpoint import ResumableGHMC

    def pot(z):
        return 0.5 * jnp.sum(z ** 2)

    C, D, S = 16, 3, 150
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (C, D))
    cfg = GHMCConfig(num_warmup=100, num_samples=0)
    d1, d2 = str(tmp_path / "full"), str(tmp_path / "part")

    s_full = ResumableGHMC(pot, cfg, d1, chunk_size=50).run(
        init, key, num_samples=S)
    # interrupted after the first chunk, then resumed to completion
    s_part = ResumableGHMC(pot, cfg, d2, chunk_size=50).run(
        init, key, num_samples=50)
    s_res = ResumableGHMC(pot, cfg, d2, chunk_size=50).run(
        init, key, num_samples=S)
    assert s_full.shape == (S, C, D)
    np.testing.assert_allclose(s_res, s_full, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_part, s_full[:50], rtol=1e-5, atol=1e-6)


def test_run_until_converged_gates_on_rhat(tmp_path):
    """Convergence-gated sampling: a well-mixing Gaussian chain passes
    the rank-R-hat gate well before max_samples; the history records
    each check; and a resumed run_until continues from the same chunks."""
    cfg = HMCConfig(num_warmup=100, num_samples=0, num_leapfrog_steps=4,
                    init_step_size=0.3)
    C, D = 16, 2
    key = jax.random.PRNGKey(1)
    init = jax.random.normal(key, (C, D))

    d = str(tmp_path / "until")
    r = ResumableHMC(pot, cfg, d, chunk_size=50)
    samples, info = r.run_until(init, key, max_samples=1000,
                                min_samples=100, rhat_bar=1.1)
    assert info["converged"]
    assert samples.shape[0] < 1000          # stopped early
    assert samples.shape[0] == info["num_samples"]
    assert info["history"][-1]["stat"] < 1.1
    assert all(h["num_samples"] >= 100 for h in info["history"])

    # an impossible bar exhausts the budget without passing
    d2 = str(tmp_path / "until2")
    r2 = ResumableHMC(pot, cfg, d2, chunk_size=50)
    s2, info2 = r2.run_until(init, key, max_samples=150,
                             rhat_bar=0.5)
    assert not info2["converged"] and s2.shape[0] == 150
    # resume with an achievable bar: reuses the 3 saved chunks
    r3 = ResumableHMC(pot, cfg, d2, chunk_size=50)
    s3, info3 = r3.run_until(init, key, max_samples=400, rhat_bar=1.1)
    np.testing.assert_array_equal(s3[:150], s2)
    assert info3["converged"]
