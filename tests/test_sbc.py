"""Simulation-based calibration (SURVEY.md §5 item 5).

SBC (Talts et al. 2018): draw θ̃ ~ prior, ỹ ~ p(y|θ̃), sample the
posterior p(θ|ỹ) with the full HMC machinery, and record the rank of θ̃
among L thinned posterior draws.  If the sampler is exactly calibrated,
ranks are uniform on {0..L}.  This exercises the whole stack — handlers,
potential, adaptation, transition — as one correctness check.
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
