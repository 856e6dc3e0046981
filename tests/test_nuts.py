"""Iterative NUTS correctness (SURVEY.md §8.3 hard part #1).

Oracles: exact Gaussian targets (moments + ESS sanity), funnel-NCP
analytic posterior, and agreement with the HMC engine.
"""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu.core import get_model_info, make_potential_fn
from autoreparam_tpu.inference import effective_sample_size
from autoreparam_tpu.inference.nuts import nuts_kernel, run_nuts
from autoreparam_tpu.models import get_model
from autoreparam_tpu.reparam import make_ncp_model, recover_fn


def test_nuts_standard_normal():
    def pot(z):
        return 0.5 * (z[0] ** 2 + z[1] ** 2 / 4.0)

    C = 32
    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (C, 2))
    samples, stats = run_nuts(pot, init, key, num_warmup=300,
                              num_samples=300, max_tree_depth=6)
    assert samples.shape == (300, C, 2)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), [0.0, 0.0], atol=0.15)
    np.testing.assert_allclose(flat.std(0), [1.0, 2.0], rtol=0.12)
    # trees actually grow (not all depth-1) and adapt sensibly
    assert float(np.asarray(stats["tree_depth"]).mean()) >= 1.5
    acc = float(np.asarray(stats["accept_prob"]).mean())
    assert 0.6 < acc <= 1.0
    # no divergences on a Gaussian
    assert float(np.asarray(stats["divergences"]).mean()) < 0.01
    # NUTS on iid-ish target should have high ESS per sample
    ess = np.asarray(effective_sample_size(samples))
    assert np.all(ess > 0.2 * 300 * C)


def test_nuts_correlated_gaussian():
    """Strong correlation: NUTS must still recover the marginals."""
    rho = 0.9
    prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]]))
    P = jnp.asarray(prec, jnp.float32)

    def pot(z):
        return 0.5 * z @ P @ z

    C = 32
    key = jax.random.PRNGKey(1)
    init = 0.1 * jax.random.normal(key, (C, 2))
    samples, stats = run_nuts(pot, init, key, num_warmup=300,
                              num_samples=400, max_tree_depth=7)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.std(0), [1.0, 1.0], rtol=0.15)
    emp_rho = np.corrcoef(flat.T)[0, 1]
    np.testing.assert_allclose(emp_rho, rho, atol=0.05)


def test_nuts_funnel_ncp_analytic():
    spec = get_model("neals_funnel")
    ncp = make_ncp_model(spec.model, model_args=spec.args)
    info = get_model_info(ncp, spec.args)
    rec = recover_fn(ncp, info, spec.args)
    pot = make_potential_fn(ncp, info, spec.args)
    key = jax.random.PRNGKey(2)
    C = 16
    init = 0.5 * jax.random.normal(key, (C, info.dim))
    samples, _ = run_nuts(pot, init, key, num_warmup=300,
                          num_samples=400, max_tree_depth=6,
                          collect_fn=lambda z: rec(z)["v"])
    v = np.asarray(samples)
    ess = float(effective_sample_size(jnp.asarray(v[..., None]))[0])
    se = 3.0 / np.sqrt(max(ess, 1.0))
    assert abs(v.mean()) < 4 * se
    np.testing.assert_allclose(v.std(), 3.0, rtol=0.12)


def test_nuts_kernel_single_transition_shapes():
    def pot(z):
        return 0.5 * jnp.sum(z ** 2)

    kern = nuts_kernel(pot, max_tree_depth=4)
    z = jnp.asarray([0.5, -0.5, 1.0])
    z2, info = kern(z, jax.random.PRNGKey(0), jnp.float32(0.5),
                    jnp.ones(3))
    assert z2.shape == (3,)
    assert np.isfinite(float(info.accept_prob))
    assert 1 <= int(info.depth) <= 4
    assert float(info.num_grads) >= 1
