"""run_experiment dispatch: every method × inference combo runs and
produces coherent summaries (reference main.py's dispatch surface)."""

import numpy as np
import pytest

from autoreparam_tpu.inference.pipeline import run_experiment
from autoreparam_tpu.models import get_model
from autoreparam_tpu.utils.results import load_results, save_result


SMALL = dict(num_chains=8, num_warmup=80, num_samples=80,
             num_leapfrog_steps=6, num_optimization_steps=300,
             learning_rate=0.05, seed=0)


@pytest.mark.parametrize("method", ["cp", "ncp", "cvip", "dvip",
                                    "interleaved"])
def test_methods_on_funnel_hmc(method):
    """All methods dispatch and produce coherent summaries.  CP on the
    funnel is the paper's pathological case — it is *expected* not to
    converge in a short run, so only the well-posed methods get a
    convergence assertion (the CP-vs-NCP ordering is asserted in
    test_funnel_cp_vs_ncp_ordering)."""
    spec = get_model("neals_funnel")
    res = run_experiment(spec, method=method, inference="hmc", **SMALL)
    s = res.summary
    assert np.isfinite(s["ess_min"])
    assert np.isfinite(s["rhat_max"])
    assert "v" in s["param_names"]
    if method == "ncp":
        assert s["rhat_max"] < 1.6
    if method in ("cvip", "dvip"):
        assert "lambda" in s
        lam_x = np.asarray(s["lambda"]["x"])
        if method == "dvip":
            # default dvip_keep_band=0.3: every element is either
            # snapped to {0,1} or kept continuous inside the band
            snapped = np.isin(lam_x, [0.0, 1.0])
            in_band = np.abs(lam_x - 0.5) < 0.3
            assert np.all(snapped | in_band)


def test_dvip_pure_threshold_knob():
    """dvip_keep_band=0.0 restores the reference's pure 0.5-threshold
    rule (SURVEY.md §3.1 [M]): every lambda element lands in {0, 1}."""
    spec = get_model("neals_funnel")
    res = run_experiment(spec, method="dvip", inference="hmc",
                         dvip_keep_band=0.0, **SMALL)
    for v in res.summary["lambda"].values():
        assert set(np.unique(np.asarray(v))) <= {0.0, 1.0}


def test_funnel_cp_vs_ncp_ordering():
    """The reference's headline qualitative result on the funnel: NCP
    mixes, CP does not (SURVEY.md §1; paper Fig. 1)."""
    spec = get_model("neals_funnel")
    cp = run_experiment(spec, method="cp", inference="hmc", **SMALL)
    ncp = run_experiment(spec, method="ncp", inference="hmc", **SMALL)
    assert ncp.summary["ess_min"] > 2.0 * cp.summary["ess_min"]
    assert ncp.summary["rhat_max"] < cp.summary["rhat_max"]


def test_nuts_inference_on_funnel():
    spec = get_model("neals_funnel")
    res = run_experiment(spec, method="ncp", inference="nuts",
                         max_tree_depth=5, **SMALL)
    assert np.isfinite(res.summary["ess_min"])
    assert res.summary["rhat_max"] < 2.0


def test_vi_inference():
    spec = get_model("neals_funnel")
    res = run_experiment(spec, method="cvip", inference="vi", **SMALL)
    assert np.isfinite(res.summary["elbo"])
    assert res.lam is not None


def test_results_roundtrip(tmp_path):
    spec = get_model("neals_funnel")
    res = run_experiment(spec, method="cp", inference="hmc", **SMALL)
    p = save_result(str(tmp_path), res.summary)
    loaded = load_results(str(tmp_path))
    assert len(loaded) == 1
    assert loaded[0]["model"] == "neals_funnel"
    assert abs(loaded[0]["ess_min"] - res.summary["ess_min"]) < 1e-3


def test_bad_method_and_inference_raise():
    spec = get_model("neals_funnel")
    with pytest.raises(ValueError):
        run_experiment(spec, method="bogus")
    with pytest.raises(ValueError):
        run_experiment(spec, inference="bogus")


def test_config_presets():
    from autoreparam_tpu.utils.config import get_config, run_from_config

    c = get_config("neals_funnel")
    assert c.num_leapfrog_steps == 8
    c.num_chains, c.num_warmup, c.num_samples = 8, 60, 60
    c.method = "ncp"
    res = run_from_config(c)
    assert np.isfinite(res.summary["ess_min"])


def test_vi_is_ess_trust_diagnostic():
    """The q* trust diagnostic (relative importance-sampling ESS) must
    separate a collapsed mean-field surrogate from an accurate one —
    it gates whether the q*-variance mass seed is used (the
    german-gammascale failure mode: q* scale 0.10 vs posterior sd 1.3
    trapped warmup's windowed ensemble estimator)."""
    import jax
    import jax.numpy as jnp

    from autoreparam_tpu.inference.pipeline import _vi_is_ess_frac
    from autoreparam_tpu.inference.vi import VIResult

    true_var = jnp.concatenate([jnp.full(10, 4.0), jnp.full(10, 0.25)])

    def pot(z):  # N(0, diag(true_var))
        return 0.5 * jnp.sum(z ** 2 / true_var)

    # collapsed surrogate: scales 5x too small (variance 25x off)
    vi_bad = VIResult(loc=jnp.zeros(20), scale=jnp.sqrt(true_var) / 5.0,
                      lam={}, elbo_trace=None, info=None)
    frac_bad = _vi_is_ess_frac(pot, vi_bad, jax.random.PRNGKey(0),
                               n=8192)
    # accurate surrogate
    vi_good = VIResult(loc=jnp.zeros(20), scale=jnp.sqrt(true_var),
                       lam={}, elbo_trace=None, info=None)
    frac_good = _vi_is_ess_frac(pot, vi_good, jax.random.PRNGKey(1),
                                n=8192)
    assert frac_good > 0.5
    assert frac_bad < 0.005
    assert frac_bad < frac_good


def test_mixed_simplex_and_location_scale_model():
    """cVIP pipeline on a model mixing VIP-eligible location-scale
    sites with a non-eligible simplex (Dirichlet) latent: λ must be
    learned ONLY on the eligible sites, and the stick-broken coordinates
    must ride the same warmup/sampling machinery (incl. the interleaved
    CP/NCP coordinate maps, which must pass simplex coordinates through
    untouched)."""
    import jax.numpy as jnp

    from autoreparam_tpu import dists as d
    from autoreparam_tpu.core import sample as ppl_sample
    from autoreparam_tpu.models.zoo import ModelSpec

    y = np.array([1.2, 0.8, 2.1, 1.7, -0.3, 0.9], np.float32)
    counts = np.array([4.0, 9.0, 7.0], np.float32)

    def model(y, counts):
        mu = ppl_sample("mu", d.Normal(0.0, 3.0))
        theta = ppl_sample("theta", d.Normal(mu, 1.0), sample_shape=(6,))
        ppl_sample("y", d.Normal(theta, 0.5), obs=y)
        w = ppl_sample("w", d.Dirichlet(jnp.asarray([1.0, 1.0, 1.0])))
        ppl_sample("c", d.Multinomial(counts.sum(), jnp.log(w)),
                   obs=counts)

    spec = ModelSpec("mixed", model, (y, counts), {}, "")
    post_mean = (1.0 + counts) / (3.0 + counts.sum())
    for method in ("cvip", "interleaved"):
        res = run_experiment(spec, method=method, inference="hmc",
                             num_chains=8, num_warmup=300,
                             num_samples=300, num_leapfrog_steps=8,
                             seed=0)
        assert res.summary["rhat_max"] < 1.1
        lam = res.summary.get("lambda")
        if method == "cvip":
            assert sorted(lam) == ["mu", "theta"]  # w NOT VIP-rewritten
        names = list(res.summary["param_names"])
        mw = np.array([res.summary["mean"][names.index(f"w[{i}]")]
                       for i in range(3)])
        np.testing.assert_allclose(mw, post_mean, atol=0.05)


def test_vi_rank_flows_into_init_and_mass():
    """vi_rank>0 (the election88 lever, run_zoo FULL_OVERRIDES) must
    change what HMC consumes, not just the ELBO: q* carries a low-rank
    covariance factor, chain init draws from the FULL q (correlated),
    and the q*^2 mass seed uses the marginal scale diag(sigma^2)+VV^T
    (pipeline.py:263), which dominates the diagonal leg wherever the
    factor is non-zero."""
    import jax

    spec = get_model("eight_schools")
    res = run_experiment(spec, method="cvip", inference="hmc",
                         vi_rank=2, **SMALL)
    s = res.summary
    assert s["vi_rank"] == 2
    vi = res.vi
    D = vi.loc.shape[-1]
    assert vi.factor is not None and vi.factor.shape == (D, 2)
    marg = np.asarray(vi.marginal_scale())
    diag = np.asarray(vi.scale)
    assert np.all(marg >= diag - 1e-7) and marg.max() > diag.max()

    # full-q draws are correlated exactly as loc + scale*eps0 + eps1@V^T
    # implies: empirical covariance ~ diag(scale^2) + V V^T, which has
    # off-diagonal mass a mean-field q cannot produce
    draws = np.asarray(vi.sample(jax.random.PRNGKey(3), 4096))
    cov = np.cov(draws.T)
    target = np.diag(diag ** 2) + np.asarray(vi.factor) @ np.asarray(
        vi.factor).T
    off = ~np.eye(D, dtype=bool)
    assert np.abs(cov[off] - target[off]).max() < 0.15 * (
        1e-6 + np.abs(target[off]).max() + target.diagonal().max())

    # rank-0 on the same seed is the mean-field baseline: no factor,
    # marginal scale == diagonal scale (bit-identical program)
    res0 = run_experiment(spec, method="cvip", inference="hmc",
                          vi_rank=0, **SMALL)
    assert res0.vi.factor is None
    assert res0.summary.get("vi_rank", 0) == 0


@pytest.mark.parametrize("method", ["cp", "ncp", "cvip", "interleaved"])
def test_tail_transport_flows_through_methods(method):
    """run_experiment(tail_transport=True) composes with every method:
    the HalfCauchy sigma-sites become Gaussian-base latents, the
    summary records the knob, and the model-space readout still
    reports log(sigma) coordinates."""
    spec = get_model("radon", "MN")
    res = run_experiment(spec, method=method, inference="hmc",
                         tail_transport=True, **SMALL)
    s = res.summary
    assert s["tail_transport"] is True
    assert np.isfinite(s["ess_min"])
    assert "log(sigma_a)" in s["param_names"]
    assert "log(sigma_y)" in s["param_names"]
