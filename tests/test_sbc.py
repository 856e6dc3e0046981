"""Simulation-based calibration (SURVEY.md §5 item 5).

SBC (Talts et al. 2018): draw θ̃ ~ prior, ỹ ~ p(y|θ̃), sample the
posterior p(θ|ỹ) with the full HMC machinery, and record the rank of θ̃
among L thinned posterior draws.  If the sampler is exactly calibrated,
ranks are uniform on {0..L}.  This exercises the whole stack — handlers,
potential, adaptation, transition — as one correctness check.

Two tiers here:
- a conjugate-Normal toy with a hand-rolled fixed-step kernel (fast
  smoke of the rank machinery itself), and
- the REAL stack: eight_schools-NCP replicas through `run_hmc`'s full
  warmup (dual averaging + windowed Welford mass) and `recover_fn`
  readout, vmapped over K=128 prior-predictive datasets — plus a power
  check asserting that a deliberately crippled adaptation FAILS the
  same uniformity test (so the test would catch an adaptation bug that
  leaves chains too correlated/frozen).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from autoreparam_tpu.inference import hmc as H


def test_sbc_rank_uniformity():
    N_OBS = 3
    K = 64          # SBC replicas (as vmapped "chains" w/ per-chain data)
    L = 31          # posterior draws per replica kept for ranking

    def potential(z, y):
        # θ ~ N(0,1); y_i ~ N(θ, 1)
        return 0.5 * z[0] ** 2 + 0.5 * jnp.sum((y - z[0]) ** 2)

    key = jax.random.PRNGKey(0)
    k_prior, k_data, k_run = jax.random.split(key, 3)
    theta_true = jax.random.normal(k_prior, (K,))
    y = theta_true[:, None] + jax.random.normal(k_data, (K, N_OBS))

    def one_step(z, y_k, key, eps, im):
        kern = H.hmc_kernel(lambda zz: potential(zz, y_k), 8)
        pot0, grad0 = jax.value_and_grad(
            lambda zz: potential(zz, y_k))(z)
        st_ = H.HMCState(z, pot0, grad0)
        st_, info = kern(st_, key, eps, im)
        return st_.z, info.accept_prob

    v_step = jax.vmap(one_step, in_axes=(0, 0, 0, None, None))

    @jax.jit
    def run(y, key):
        z = jnp.zeros((K, 1))
        eps = jnp.float32(0.4)
        im = jnp.ones((1,))

        def warm(z, k):
            z, _ = v_step(z, y, jax.random.split(k, K), eps, im)
            return z, None

        z, _ = jax.lax.scan(warm, z, jax.random.split(key, 100))

        def draw(z, k):
            # thin by 3 to decorrelate
            for i in range(3):
                k, sub = jax.random.split(k)
                z, _ = v_step(z, y, jax.random.split(sub, K), eps, im)
            return z, z[:, 0]

        z, draws = jax.lax.scan(draw, z, jax.random.split(key, L))
        return draws  # (L, K)

    draws = run(y, k_run)
    ranks = np.sum(np.asarray(draws) < np.asarray(theta_true)[None, :],
                   axis=0)  # (K,) in {0..L}
    # chi-square uniformity test over binned ranks, generous alpha
    bins = 4
    edges = np.linspace(0, L + 1, bins + 1)
    counts, _ = np.histogram(ranks, bins=edges)
    chi2 = ((counts - K / bins) ** 2 / (K / bins)).sum()
    p = 1 - st.chi2(bins - 1).cdf(chi2)
    assert p > 0.01, (counts, p)


# ---------------------------------------------------------------------------
# Real-stack SBC: eight_schools-NCP through run_hmc's full warmup path
# ---------------------------------------------------------------------------

_SIGMA = jnp.asarray([15., 10., 16., 11., 9., 11., 10., 18.])
_K = 128          # SBC replicas (prior-predictive datasets)
_S = 256          # posterior draws per replica
_THIN = 4         # keep every 4th draw for ranking
_RANK_DIMS = ("mu", "log_tau", "theta[0]")


def _sbc_rig():
    """Joint prior-predictive draws of the NCP program: auxiliary
    coordinates (the chain initial state), model-space records (the rank
    truths), and synthetic data y — all from ONE trace, so each chain
    starts exactly at its own θ̃.  A chain initialized at θ̃ ~ p(θ|ỹ) is
    in stationarity from step 0: every subsequent state is marginally
    posterior iff the transition kernel is exact, so rank uniformity
    holds independent of mixing speed (warmup breaks the truth↔draw
    correlation; Talts et al. 2018 §5).  An MH/Jacobian/adaptation bug
    that breaks detailed balance breaks stationarity and fails the test.
    """
    from autoreparam_tpu.core import get_model_info
    from autoreparam_tpu.core.predictive import prior_predictive
    from autoreparam_tpu.models.zoo import eight_schools_model
    from autoreparam_tpu.reparam import make_ncp_model

    key = jax.random.PRNGKey(7)
    k_prior, k_run = jax.random.split(key)
    y0 = jnp.zeros((8,))
    ncp = make_ncp_model(eight_schools_model, model_args=(y0, _SIGMA))
    info = get_model_info(ncp, (y0, _SIGMA))

    draws = prior_predictive(ncp, k_prior, _K, model_args=(y0, _SIGMA))
    truth = np.concatenate(
        [np.asarray(draws["mu"])[:, None],
         np.asarray(draws["log_tau"])[:, None],
         np.asarray(draws["theta"])], axis=1)        # (K, 10)
    names = (["mu", "log_tau"] + [f"theta[{i}]" for i in range(8)])
    # flat unconstrained chain starts: the aux coordinates of θ̃
    init = jax.vmap(info.ravel)({s.name: draws[s.name]
                                 for s in info.latents})     # (K, D)
    return ncp, info, draws, truth, init, names, k_run


def _run_replicas(ncp, info, ys, init, keys, cfg):
    from autoreparam_tpu.core import make_potential_fn
    from autoreparam_tpu.inference.hmc import run_hmc
    from autoreparam_tpu.reparam import recover_fn

    def run_one(y_k, init_k, key):
        pot = make_potential_fn(ncp, info, (y_k, _SIGMA))
        rec = recover_fn(ncp, info, (y_k, _SIGMA))
        samples, _ = run_hmc(pot, init_k[None, :], key, cfg,
                             collect_fn=rec)
        # dict of (S, 1, ...) model-space values -> (S, 10) matrix
        return jnp.concatenate(
            [samples["mu"].reshape(cfg.num_samples, 1),
             samples["log_tau"].reshape(cfg.num_samples, 1),
             samples["theta"].reshape(cfg.num_samples, 8)], axis=1)

    return jax.jit(jax.vmap(run_one))(ys, init, keys)   # (K, S, 10)


def _rank_pvalues(post, truth, names):
    kept = np.asarray(post)[:, ::_THIN, :]           # (K, L, 10)
    L = kept.shape[1]
    ranks = (kept < np.asarray(truth)[:, None, :]).sum(axis=1)  # (K, 10)
    pvals = {}
    bins = 8
    edges = np.linspace(0, L + 1, bins + 1)
    for name in _RANK_DIMS:
        j = names.index(name)
        counts, _ = np.histogram(ranks[:, j], bins=edges)
        chi2 = ((counts - _K / bins) ** 2 / (_K / bins)).sum()
        pvals[name] = 1 - st.chi2(bins - 1).cdf(chi2)
    return pvals


def test_sbc_real_stack_eight_schools_ncp():
    """Rank uniformity through the full run_hmc warmup/DA/mass path."""
    ncp, info, draws, truth, init, names, k_run = _sbc_rig()
    cfg = H.HMCConfig(num_warmup=200, num_samples=_S,
                      num_leapfrog_steps=8)
    keys = jax.random.split(k_run, _K)
    post = _run_replicas(ncp, info, jnp.asarray(draws["y"]), init, keys,
                         cfg)
    pvals = _rank_pvalues(post, truth, names)
    # Bonferroni-ish bar across the 3 tested dims
    assert all(p > 0.005 for p in pvals.values()), pvals


def test_sbc_power_catches_broken_kernel():
    """The same rig with a deliberately broken sampler (absurd fixed
    step size, no adaptation -> frozen chains stuck at θ̃) must FAIL
    uniformity — i.e. this SBC test has the power to catch a transition
    bug that leaves draws degenerate/over-correlated."""
    ncp, info, draws, truth, init, names, k_run = _sbc_rig()
    cfg = H.HMCConfig(num_warmup=0, num_samples=_S,
                      num_leapfrog_steps=8, init_step_size=25.0,
                      adapt_mass=False)
    keys = jax.random.split(jax.random.fold_in(k_run, 1), _K)
    post = _run_replicas(ncp, info, jnp.asarray(draws["y"]), init, keys,
                         cfg)
    pvals = _rank_pvalues(post, truth, names)
    assert min(pvals.values()) < 1e-4, pvals


def _simplex_sbc_pvalues(seed=11):
    """Prior-only Dirichlet SBC through run_hmc: chains start AT the
    prior draw's stick-breaking coordinates, so every draw is marginally
    Dirichlet iff the transition is exact.  Prior-only is deliberate:
    with a concentrated likelihood the Jacobian's tilt is smaller than
    SBC's K=128 resolution (measured: even a fully DROPPED log-det
    passed at n=20 multinomial counts), while against the bare prior a
    dropped log-det distorts the target unboundedly near the simplex
    edges — that's where the power is.  The data path is covered by the
    closed-form Dirichlet-Multinomial conjugacy test (test_dists)."""
    from autoreparam_tpu import dists as d
    from autoreparam_tpu.core import (get_model_info, make_potential_fn,
                                      sample as ppl_sample)
    from autoreparam_tpu.core.predictive import prior_predictive
    from autoreparam_tpu.inference.hmc import run_hmc
    from autoreparam_tpu.reparam import recover_fn

    CONC = jnp.asarray([2.0, 3.0, 4.0])

    def model():
        ppl_sample("w", d.Dirichlet(CONC))

    info = get_model_info(model, ())
    assert info.dim == 2  # K-1 unconstrained stick coordinates

    k_prior, k_run = jax.random.split(jax.random.PRNGKey(seed))
    draws = prior_predictive(model, k_prior, _K, model_args=())
    truth = np.asarray(draws["w"])                         # (K, 3)
    init = jax.vmap(info.unconstrain)({"w": draws["w"]})   # (K, 2)

    cfg = H.HMCConfig(num_warmup=200, num_samples=_S,
                      num_leapfrog_steps=8)

    def run_one(init_k, key):
        pot = make_potential_fn(model, info, ())
        rec = recover_fn(model, info, ())
        samples, _ = run_hmc(pot, init_k[None, :], key, cfg,
                             collect_fn=rec)
        return samples["w"].reshape(cfg.num_samples, 3)

    post = jax.jit(jax.vmap(run_one))(init, jax.random.split(k_run, _K))
    kept = np.asarray(post)[:, ::_THIN, :]
    L = kept.shape[1]
    ranks = (kept < truth[:, None, :]).sum(axis=1)          # (K, 3)
    bins = 8
    edges = np.linspace(0, L + 1, bins + 1)
    ps = []
    for j in range(3):
        counts, _ = np.histogram(ranks[:, j], bins=edges)
        chi2 = ((counts - _K / bins) ** 2 / (_K / bins)).sum()
        ps.append(float(1 - st.chi2(bins - 1).cdf(chi2)))
    return ps


def test_sbc_simplex_stick_breaking():
    ps = _simplex_sbc_pvalues()
    assert all(p > 0.005 for p in ps), ps


def test_sbc_simplex_power_catches_wrong_jacobian(monkeypatch):
    """The same rig with the StickBreaking log-det zeroed must FAIL —
    i.e. the simplex SBC has the power to catch a Jacobian bug in the
    one non-elementwise support map."""
    from autoreparam_tpu.dists import bijectors as bj
    monkeypatch.setattr(bj.StickBreaking, "log_det_jacobian",
                        lambda self, x: jnp.zeros_like(x))
    ps = _simplex_sbc_pvalues()
    assert min(ps) < 1e-4, ps
