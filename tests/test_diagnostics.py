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


# -- rank-normalized diagnostics (Vehtari et al. 2021) -----------------


def test_rank_normalize_standardizes_and_is_monotone():
    key = jax.random.PRNGKey(3)
    # heavy-tailed input: Cauchy draws
    x = jax.random.cauchy(key, (500, 4, 2))
    z = np.asarray(dg.rank_normalize(x))
    flat = z.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.02)
    np.testing.assert_allclose(flat.std(0), 1.0, atol=0.05)
    # monotone: ordering preserved per dimension
    xf = np.asarray(x).reshape(-1, 2)
    for d in range(2):
        order = np.argsort(xf[:, d])
        assert np.all(np.diff(flat[order, d]) >= 0)


def test_rhat_rank_folded_detects_scale_mismatch():
    """Chains with equal means but different variances: classical split
    R-hat is blind (between-chain mean variance ~ 0), the folded half of
    rank-R-hat is not."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1000, 4, 1))
    x[:, 0] *= 3.0  # same mean, 3x the scale
    xj = jnp.asarray(x, jnp.float32)
    classical = float(dg.potential_scale_reduction(xj)[0])
    ranked = float(dg.rhat_rank(xj)[0])
    assert classical < 1.05          # blind
    assert ranked > 1.15             # caught by folding
    # and well-mixed chains stay ~1
    good = jnp.asarray(rng.normal(size=(1000, 4, 1)), jnp.float32)
    assert float(dg.rhat_rank(good)[0]) < 1.01


def test_ess_bulk_tail_iid():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2000, 4, 2))
    n = 2000 * 4
    bulk = np.asarray(dg.ess_bulk(x))
    tail = np.asarray(dg.ess_tail(x))
    assert np.all(bulk > 0.6 * n) and np.all(bulk < 1.4 * n)
    assert np.all(tail > 0.4 * n) and np.all(tail < 1.6 * n)


def test_ess_bulk_robust_to_heavy_tails():
    """Cauchy margins have no moments; bulk-ESS (rank space) must still
    report ~N for iid draws."""
    key = jax.random.PRNGKey(5)
    x = jax.random.cauchy(key, (2000, 4, 1))
    bulk = float(dg.ess_bulk(x)[0])
    n = 2000 * 4
    assert 0.5 * n < bulk < 1.5 * n


def test_summary_table_and_format():
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (400, 4, 3)) * jnp.asarray([1., 2., 3.])
    rows = dg.summary_table(x, names=["a", "b[0]", "b[1]"],
                            num_grads=400 * 16)
    assert [r["name"] for r in rows] == ["a", "b[0]", "b[1]"]
    for r in rows:
        assert r["rhat"] < 1.02
        assert r["ess_bulk"] > 500 and r["ess_tail"] > 300
        assert "q5" in r and "q95" in r and r["q5"] < r["q95"]
        assert np.isfinite(r["mcse_mean"]) and r["mcse_mean"] > 0
        assert r["ess_per_kgrad"] > 0
    np.testing.assert_allclose(rows[1]["sd"], 2.0, rtol=0.1)
    txt = dg.format_summary(rows)
    assert "ess_bulk" in txt and "b[1]" in txt
    assert len(txt.splitlines()) == 4


def test_result_summary_end_to_end():
    from autoreparam_tpu.inference import result_summary, run_experiment
    from autoreparam_tpu.models import get_model

    res = run_experiment(get_model("eight_schools"), method="ncp",
                         inference="hmc", num_chains=8, num_warmup=150,
                         num_samples=150, num_leapfrog_steps=8, seed=0)
    rows = result_summary(res)
    names = {r["name"] for r in rows}
    assert "mu" in names and "theta[0]" in names
    assert all(np.isfinite(r["rhat"]) for r in rows)
    assert all(r["ess_per_kgrad"] > 0 for r in rows)


def test_nested_rhat_iid_near_one():
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (50, 64, 2))
    r = np.asarray(dg.nested_rhat(x, num_superchains=8))
    assert r.shape == (2,)
    assert np.all(r >= 1.0)
    assert np.all(r < 1.02)


def test_nested_rhat_detects_superchain_offsets():
    """Superchains stuck in different basins must be flagged even though
    every chain individually looks stationary (split R-hat's blind spot
    is short chains; nested R-hat's design point)."""
    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, (50, 64, 1)) * 0.1
    offsets = jnp.repeat(jnp.linspace(-2.0, 2.0, 8), 8)  # per superchain
    x = x + offsets[None, :, None]
    r = float(dg.nested_rhat(x, num_superchains=8)[0])
    assert r > 1.5
    # same draws pass when the offset is shared (no between-super var)
    x_ok = x - offsets[None, :, None]
    assert float(dg.nested_rhat(x_ok, num_superchains=8)[0]) < 1.02


def test_nested_rhat_single_draw_regime():
    """The many-short-chains limit: S=1 kept draw per chain. Split R-hat
    is undefined there; nested R-hat still works off within-superchain
    spread."""
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (1, 256, 1))
    r_ok = float(dg.nested_rhat(x, num_superchains=16)[0])
    assert 1.0 <= r_ok < 1.1
    offsets = jnp.repeat(jnp.linspace(-3.0, 3.0, 16), 16)
    r_bad = float(dg.nested_rhat(x + offsets[None, :, None],
                                 num_superchains=16)[0])
    assert r_bad > 2.0


def test_nested_rhat_validates_args():
    x = jnp.zeros((10, 12, 1))
    try:
        dg.nested_rhat(x, num_superchains=5)
        assert False, "expected ValueError"
    except ValueError:
        pass
    try:
        dg.nested_rhat(jnp.zeros((1, 8, 1)), num_superchains=8)
        assert False, "expected ValueError (S=1, M=1)"
    except ValueError:
        pass


def test_ebfmi_iid_and_sticky_energy():
    key = jax.random.PRNGKey(10)
    # iid energies: E[(dE)^2] = 2 var  =>  ebfmi ~ 2
    e = jax.random.normal(key, (4000, 4))
    b = np.asarray(dg.ebfmi(e))
    assert b.shape == (4,)
    np.testing.assert_allclose(b, 2.0, rtol=0.15)
    # AR(1) with rho: ebfmi ~ 2(1 - rho)  -> sticky series flagged
    rho = 0.95
    eps = np.asarray(jax.random.normal(jax.random.PRNGKey(11), (4000, 4)))
    x = np.zeros_like(eps)
    for t in range(1, eps.shape[0]):
        x[t] = rho * x[t - 1] + np.sqrt(1 - rho ** 2) * eps[t]
    b_ar = np.asarray(dg.ebfmi(jnp.asarray(x)))
    np.testing.assert_allclose(b_ar, 2 * (1 - rho), rtol=0.35)
    assert np.all(b_ar < 0.3)  # Stan's warning bar fires
