"""Pallas fused-leapfrog kernel vs the XLA reference path
(SURVEY.md §5 item 6: every Pallas kernel has a lax.scan reference
implementation; equivalence-tested).  Runs in interpret mode on CPU;
the bench harness exercises the compiled kernel on real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from autoreparam_tpu.inference import hmc as H
from autoreparam_tpu.ops.fused_leapfrog import (fused_hmc_kernel,
                                                make_fused_leapfrog)


def _funnel_potential(dim):
    """Analytic funnel potential on a flat (dim,) vector: z = (v, x)."""
    def pot(z):
        v = z[0]
        x = z[1:]
        return (v ** 2 / 18.0
                + 0.5 * jnp.sum(x ** 2) * jnp.exp(-v)
                + (dim - 1) * v / 2.0)
    return pot


def test_fused_leapfrog_matches_xla_path():
    D = 8
    pot = _funnel_potential(D)
    C = 16
    key = jax.random.PRNGKey(0)
    z = 0.5 * jax.random.normal(key, (C, D))
    r = jax.random.normal(jax.random.PRNGKey(1), (C, D))
    step = jnp.full((C,), 0.05)
    inv_mass = jnp.ones((C, D))
    pg = jax.vmap(jax.value_and_grad(pot))
    _, grad0 = pg(z)

    L = 10
    # XLA reference: vmapped scan leapfrog
    ref = jax.vmap(
        lambda z1, r1, g1, e1, m1: H.leapfrog(
            jax.value_and_grad(pot), z1, r1, g1, e1, m1, L))
    z_ref, r_ref, pot_ref, grad_ref = ref(z, r, grad0, step, inv_mass)

    fused = make_fused_leapfrog(pot, L, D, block_chains=8, interpret=True)
    z_f, r_f, pot_f, grad_f = fused(z, r, grad0, step, inv_mass)

    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pot_f), np.asarray(pot_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_f), np.asarray(grad_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_transition_matches_xla_kernel():
    """The fully-fused transition (momentum refresh + L leapfrogs +
    energies + Metropolis select in ONE Pallas call) must reproduce
    vmap(hmc.hmc_kernel) given the same per-chain keys: RNG stays
    outside the kernel precisely so this comparison is exact."""
    D = 8
    pot = _funnel_potential(D)
    C = 16
    z = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (C, D))
    pot0, grad0 = jax.vmap(jax.value_and_grad(pot))(z)
    state = H.HMCState(z, pot0, grad0)
    keys = jax.random.split(jax.random.PRNGKey(7), C)
    step = jnp.full((C,), 0.12)
    inv_mass = jnp.ones((C, D)).at[:, 0].set(2.5)

    ref_step = jax.vmap(H.hmc_kernel(pot, 10), in_axes=(0, 0, 0, 0))
    st_ref, info_ref = ref_step(state, keys, step, inv_mass)

    kern = fused_hmc_kernel(pot, num_leapfrog_steps=10, dim=D,
                            block_chains=8, interpret=True)
    st_f, info_f = kern(state, keys, step, inv_mass)

    np.testing.assert_allclose(np.asarray(st_f.z), np.asarray(st_ref.z),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_f.pot),
                               np.asarray(st_ref.pot),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_f.grad),
                               np.asarray(st_ref.grad),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(info_f.accept_prob),
                               np.asarray(info_ref.accept_prob),
                               rtol=1e-4, atol=1e-5)
    # accept decisions are identical draws -> identical booleans
    # (tolerate nothing here: u and accept_prob match to float eps)
    np.testing.assert_array_equal(np.asarray(info_f.is_accepted),
                                  np.asarray(info_ref.is_accepted))
    np.testing.assert_array_equal(np.asarray(info_f.is_divergent),
                                  np.asarray(info_ref.is_divergent))
    np.testing.assert_allclose(np.asarray(info_f.energy),
                               np.asarray(info_ref.energy),
                               rtol=1e-4, atol=1e-4)


def test_fused_transition_real_model_hoisted_consts():
    """Real-model potential (radon MN): closes over sufficient-stat
    data tables, which closure conversion hoists into pallas_call
    operands (ops/fused_leapfrog._hoist_constants).  Must reproduce
    vmap(hmc.hmc_kernel) exactly like the synthetic case."""
    from autoreparam_tpu.core import get_model_info, make_potential_fn
    from autoreparam_tpu.models import get_model

    spec = get_model("radon", "MN")
    info = get_model_info(spec.model, spec.args)
    pot = make_potential_fn(spec.model, info, spec.args)
    D = info.dim
    C = 8
    z = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (C, D))
    pot0, grad0 = jax.vmap(jax.value_and_grad(pot))(z)
    state = H.HMCState(z, pot0, grad0)
    keys = jax.random.split(jax.random.PRNGKey(11), C)
    step = jnp.full((C,), 0.05)
    inv_mass = jnp.ones((C, D))

    ref_step = jax.vmap(H.hmc_kernel(pot, 5), in_axes=(0, 0, 0, 0))
    st_ref, info_ref = ref_step(state, keys, step, inv_mass)

    kern = fused_hmc_kernel(pot, num_leapfrog_steps=5, dim=D,
                            block_chains=8, interpret=True)
    st_f, info_f = kern(state, keys, step, inv_mass)

    np.testing.assert_allclose(np.asarray(st_f.z), np.asarray(st_ref.z),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_f.pot),
                               np.asarray(st_ref.pot),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(info_f.is_accepted),
                                  np.asarray(info_ref.is_accepted))


def test_fused_hmc_kernel_transition_valid():
    """Full fused transition: correct shapes, acceptance in [0,1], and a
    statistically valid chain on a Gaussian target."""
    D = 4

    def pot(z):
        return 0.5 * jnp.sum(z ** 2)

    C = 8
    kern = fused_hmc_kernel(pot, num_leapfrog_steps=8, dim=D,
                            block_chains=8, interpret=True)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (C, D))
    pg = jax.vmap(jax.value_and_grad(pot))
    pot0, grad0 = pg(z)
    state = H.HMCState(z, pot0, grad0)
    keys = jax.random.split(key, C)
    new_state, info = kern(state, keys, jnp.full((C,), 0.3),
                           jnp.ones((C, D)))
    assert new_state.z.shape == (C, D)
    a = np.asarray(info.accept_prob)
    assert np.all((a >= 0) & (a <= 1))
    assert np.asarray(info.is_accepted).any()

    # run a short chain and check moments
    def step(carry, k):
        st = carry
        ks = jax.random.split(k, C)
        st, _ = kern(st, ks, jnp.full((C,), 0.3), jnp.ones((C, D)))
        return st, st.z

    _, zs = jax.lax.scan(step, new_state,
                         jax.random.split(jax.random.PRNGKey(2), 300))
    flat = np.asarray(zs).reshape(-1, D)
    np.testing.assert_allclose(flat.mean(0), np.zeros(D), atol=0.25)
    np.testing.assert_allclose(flat.std(0), np.ones(D), rtol=0.15)
