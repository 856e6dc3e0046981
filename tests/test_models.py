"""Model zoo smoke tests: every model traces, has a finite differentiable
potential, and the registry dispatches (SURVEY.md §3.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoreparam_tpu.core import get_model_info, make_potential_fn
from autoreparam_tpu.models import MODEL_REGISTRY, get_model
from autoreparam_tpu.reparam import eligible_sites

ALL_MODELS = sorted(MODEL_REGISTRY)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_model_potential_finite_and_differentiable(name):
    spec = get_model(name)
    info = get_model_info(spec.model, spec.args, spec.kwargs)
    assert info.dim > 0
    pot = make_potential_fn(spec.model, info, spec.args, spec.kwargs)
    z = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (info.dim,))
    u, g = jax.value_and_grad(pot)(z)
    assert np.isfinite(float(u))
    assert np.all(np.isfinite(np.asarray(g)))


def test_registry_dims():
    assert get_model("eight_schools").args[0].shape == (8,)
    info = get_model_info(*(lambda s: (s.model, s.args))(
        get_model("eight_schools")))
    assert info.dim == 10  # mu, log_tau, theta(8)
    spec = get_model("radon", "MN:raw")
    assert spec.args[0].shape[0] == 919
    info = get_model_info(spec.model, spec.args)
    assert info.dim == 85 + 5  # a(85) + mua, b, sigma_a, b_floor, sigma_y
    binned = get_model("radon", "MN")
    assert binned.args[0].shape[0] <= 2 * 85  # county x floor cells
    assert get_model_info(binned.model, binned.args).dim == 90
    spec = get_model("election88")
    info = get_model_info(spec.model, spec.args)
    # full G&H ch.14 model: 4 scalar effects + 5 scale params + age(4)
    # + edu(4) + age*edu(16) + region(5) + state(51)
    assert info.dim == 89


def test_radon_states_distinct():
    mn = get_model("radon", "MN:raw")
    nd = get_model("radon", "ND:raw")
    assert mn.args[0].shape[0] == 919
    assert nd.args[0].shape[0] == 431


def test_eligible_sites_on_zoo():
    spec = get_model("eight_schools")
    el = eligible_sites(spec.model, spec.args)
    assert "theta" in el
    spec = get_model("german_credit_lognormalcentered")
    el = eligible_sites(spec.model, spec.args)
    # LogNormal scales are eligible via log-space reparam
    assert "overall_scale" in el and "local_scales" in el


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        get_model("not_a_model")


def test_election88_cells_exact_sufficient_stats():
    """Binned Binomial likelihood == respondent-level Bernoulli
    likelihood (same log-joint up to the data-permutation constant
    C(n,k) terms' difference: the binomial coefficient is constant in
    the parameters, so gradients and posteriors are identical)."""
    from autoreparam_tpu.core import log_density

    binned = get_model("election88")
    raw = get_model("election88", "raw")
    params = {"mua": 0.2, "b_female": -0.1, "b_black": -1.0,
              "b_v_prev": 1.5, "sigma_a": 0.5, "sigma_age": 0.3,
              "sigma_edu": 0.4, "sigma_age_edu": 0.2,
              "sigma_region": 0.25}
    import jax.numpy as jnp
    import scipy.special as sp
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    params["a"] = jnp.asarray(
        0.1 * np.cos(np.arange(51)).astype(np.float32))
    params["a_age"] = jnp.asarray(
        0.1 * np.sin(np.arange(4)).astype(np.float32))
    params["a_edu"] = jnp.asarray(
        0.05 * np.cos(np.arange(4)).astype(np.float32))
    params["a_age_edu"] = jnp.asarray(
        0.03 * np.sin(np.arange(16)).astype(np.float32))
    params["a_region"] = jnp.asarray(
        0.2 * np.cos(np.arange(5)).astype(np.float32))
    lp_b, _ = log_density(binned.model, binned.args, {}, params)
    lp_r, _ = log_density(raw.model, raw.args, {}, params)
    # remove the parameter-independent log C(n,k) sum from the binomial
    total = np.asarray(binned.args[5], np.float64)
    yes = np.asarray(binned.args[6], np.float64)
    log_comb = (sp.gammaln(total + 1) - sp.gammaln(yes + 1)
                - sp.gammaln(total - yes + 1)).sum()
    np.testing.assert_allclose(float(lp_b) - log_comb, float(lp_r),
                               rtol=2e-5)


def test_radon_cells_exact_sufficient_stats():
    """Binned Gaussian-sufficient-stats likelihood == respondent-level
    likelihood exactly (same parameters -> same log-joint)."""
    from autoreparam_tpu.core import log_density
    import jax.numpy as jnp

    binned = get_model("radon", "MN")
    raw = get_model("radon", "MN:raw")
    n_c = 85
    params = {"mua": jnp.float32(0.3), "b": jnp.float32(0.5),
              "sigma_a": jnp.float32(0.2),
              "a": jnp.asarray(1.4 + 0.1 * np.sin(np.arange(n_c)),
                               jnp.float32),
              "b_floor": jnp.float32(-0.6),
              "sigma_y": jnp.float32(0.8)}
    lp_b, _ = log_density(binned.model, binned.args, {}, params)
    lp_r, _ = log_density(raw.model, raw.args, {}, params)
    np.testing.assert_allclose(float(lp_b), float(lp_r), rtol=3e-5)


def test_normal_suffstats_dist():
    from autoreparam_tpu import dists as d
    import scipy.stats as st

    y = np.array([0.3, -0.7, 1.1, 0.5], np.float32)
    loc, scale = 0.2, 1.3
    ybar = y.mean()
    ss = ((y - ybar) ** 2).sum()
    dist = d.NormalSufficientStats(loc, scale, 4.0, ss)
    want = st.norm(loc, scale).logpdf(y).sum()
    np.testing.assert_allclose(float(dist.log_prob(ybar)), want,
                               rtol=1e-5)


@pytest.mark.parametrize("name", ["radon", "election88", "electric"])
def test_take_matmul_matches_gather(name):
    """zoo.take's one-hot MXU lowering is bit-exact vs plain indexing
    (one unit entry per one-hot row + HIGHEST precision), for both the
    potential and its gradient — the quantity HMC consumes 2L times per
    transition."""
    from autoreparam_tpu.models import zoo

    spec = get_model(name, "MN" if name == "radon" else None)
    info = get_model_info(spec.model, spec.args)
    pot = make_potential_fn(spec.model, info, spec.args)
    z = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (4, info.dim))
    old = zoo.GATHER_IMPL
    old_fused = zoo.FUSED_DESIGN
    try:
        # pin the separate-takes formulation: this test asserts take()'s
        # per-site one-hot lowering is BIT-exact vs gather; the fused
        # design matmul (different summation order) has its own
        # allclose-level test below
        zoo.FUSED_DESIGN = False
        zoo.GATHER_IMPL = "matmul"
        u_m, g_m = jax.vmap(jax.value_and_grad(pot))(z)
        zoo.GATHER_IMPL = "gather"
        u_g, g_g = jax.vmap(jax.value_and_grad(pot))(z)
        # "auto" dispatches per call site (mixed impls within one model,
        # threshold at _AUTO_MATMUL_MIN_ROWS) and must stay bit-exact
        # too — election88 exercises both narrow and wide takes
        zoo.GATHER_IMPL = "auto"
        u_a, g_a = jax.vmap(jax.value_and_grad(pot))(z)
    finally:
        zoo.GATHER_IMPL = old
        zoo.FUSED_DESIGN = old_fused
    np.testing.assert_allclose(np.asarray(u_m), np.asarray(u_g), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_g), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_g), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_g), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("dataset", [None, "raw"])
def test_election88_fused_design_matches_separate_takes(dataset):
    """election88's fused design matmul (one constant multi-hot matrix
    folding 4 take() lookups + 2 fixed-effect columns into a single MXU
    contraction; zoo.FUSED_DESIGN) computes the same potential and
    gradient as the separate-takes formulation — the traffic-reduction
    rewrite the roofline analysis calls for (PERF.md)."""
    from autoreparam_tpu.models import zoo

    spec = get_model("election88", dataset)
    info = get_model_info(spec.model, spec.args)
    pot = make_potential_fn(spec.model, info, spec.args)
    z = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (4, info.dim))
    old = zoo.FUSED_DESIGN
    try:
        zoo.FUSED_DESIGN = True
        u_f, g_f = jax.vmap(jax.value_and_grad(pot))(z)
        zoo.FUSED_DESIGN = False
        u_s, g_s = jax.vmap(jax.value_and_grad(pot))(z)
    finally:
        zoo.FUSED_DESIGN = old
    # one contraction reassociates the f32 sums the separate takes did
    # in program order: allclose, not bit-equal (measured max rel 5e-5)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s), rtol=2e-4,
                               atol=1e-3)


def test_take_rejects_out_of_range_indices():
    """The one-hot matmul path yields 0 for out-of-range rows while the
    gather path clamps (JAX default) — silently different results; take()
    therefore validates its constant idx at trace time."""
    from autoreparam_tpu.models import zoo

    table = jnp.arange(4.0)
    with pytest.raises(ValueError, match="out of range"):
        zoo.take(table, np.array([0, 4]), 4)
    with pytest.raises(ValueError, match="out of range"):
        zoo.take(table, np.array([-1, 2]), 4)


def test_real_data_drop_in(tmp_path, monkeypatch):
    """models/data real-data drop-in path (VERDICT r3 task 9): a real
    .npz in $AUTOREPARAM_TPU_DATA_DIR with the synthetic schema replaces
    the stand-in (sizes may differ); a wrong key schema is rejected."""
    from autoreparam_tpu.models import data as data_lib

    synth = data_lib.load_electric()
    n_pairs = 7
    real = {
        "pair_idx": np.repeat(np.arange(n_pairs), 2).astype(np.int32),
        "treatment": np.tile(np.array([0.0, 1.0], np.float32), n_pairs),
        "y": np.linspace(90.0, 110.0, 2 * n_pairs).astype(np.float32),
        "n_pairs": np.asarray(n_pairs, np.int32),
    }
    assert set(real) == set(synth)
    np.savez(tmp_path / "electric.npz", **real)
    monkeypatch.setenv("AUTOREPARAM_TPU_DATA_DIR", str(tmp_path))
    got = data_lib.load_electric()
    assert int(got["n_pairs"]) == n_pairs
    np.testing.assert_array_equal(got["y"], real["y"])
    # the model builds and evaluates on the dropped-in data
    spec = get_model("electric")
    info = get_model_info(spec.model, spec.args)
    pot = make_potential_fn(spec.model, info, spec.args)
    u = pot(0.1 * jnp.ones((info.dim,)))
    assert np.isfinite(float(u))
    # schema mismatch is rejected loudly
    np.savez(tmp_path / "german_credit.npz", bogus=np.zeros(3))
    with pytest.raises(ValueError, match="key schema mismatch"):
        data_lib.load_german_credit()


def test_standin_pinned_facts():
    """The committed stand-in datasets match the published real-dataset
    facts tabulated in models/data/DATA.md (VERDICT r4 task 6): shapes
    exactly, summary statistics within the documented tolerance.  A
    regenerated stand-in that drifts from the published facts fails
    here; a real-data swap-in is validated against the same table."""
    from autoreparam_tpu.models import data as data_lib

    r = data_lib.load_radon("MN")
    assert r["log_radon"].shape == (919,)
    assert int(r["n_counties"]) == 85
    assert abs(float(r["log_radon"].mean()) - 1.25) < 0.15
    assert abs(float(r["log_radon"].std()) - 0.85) < 0.15
    assert abs(float(r["floor"].mean()) - 0.17) < 0.05
    sizes = np.bincount(r["county_idx"], minlength=85)
    assert sizes.min() >= 1 and sizes.max() > 30  # real imbalance
    for st, (n_obs, n_cty) in data_lib.RADON_STATES.items():
        d = data_lib.load_radon(st)
        assert d["log_radon"].shape == (n_obs,)
        assert int(d["n_counties"]) == n_cty

    g = data_lib.load_german_credit()
    assert g["x"].shape == (1000, 24)
    np.testing.assert_allclose(g["x"].mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(g["x"].std(0), 1.0, atol=1e-4)
    assert 0.25 < float(g["y"].mean()) < 0.45  # ~30% bad credit

    e = data_lib.load_election88()
    assert e["y"].shape == (11566,)
    assert (int(e["n_states"]), int(e["n_age"]), int(e["n_edu"]),
            int(e["n_region"])) == (51, 4, 4, 5)
    assert abs(float(e["y"].mean()) - 0.56) < 0.05
    assert abs(float(e["female"].mean()) - 0.54) < 0.03
    assert abs(float(e["black"].mean()) - 0.10) < 0.03
    assert abs(float(e["v_prev"].std()) - 0.07) < 0.03

    el = data_lib.load_electric()
    assert int(el["n_pairs"]) == 96
    assert el["y"].shape == (192,)
    assert 90 < float(el["y"].mean()) < 110
