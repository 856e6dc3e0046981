"""No-U-Turn Sampler, iterative and TPU-shaped.

The reference used `tfp.mcmc` HMC only; NUTS is required by BASELINE
config #5 (election88, 8192 vmapped NUTS chains on a mesh) and is the
modern default sampler, so this module is a first-class engine.

TPU constraints shape the whole design (SURVEY.md §8.3 #1): no
recursion, no dynamic shapes.  This is the *iterative* multinomial NUTS
(Hoffman & Gelman arXiv:1111.4246; iterative formulation and
momentum-sum U-turn criterion as in NumPyro, arXiv:1912.11554 §A):

- The outer doubling loop is a static Python loop over
  `max_tree_depth` iterations; iteration j grows the trajectory by a
  subtree of 2^j leapfrog steps via `lax.scan` — every shape static.
- Chains that have terminated (U-turn/divergence) are *masked*: their
  state is frozen while the batch marches in lockstep.  This wastes
  FLOPs on finished chains but keeps 8k+ chains dense on the VPU —
  the standard accelerator trade.
- Within-subtree U-turn checks use the O(log) checkpoint scheme: leaf
  k's checkpoint slot indices are *precomputed host-side* (popcount /
  trailing-ones tables fed as scan inputs), so no bit-twiddling runs
  on-device.
- U-turn criterion: generalized momentum-sum test
  (dot(v_end, ρ − r_end/2 ...) ≤ 0 at either end).

Per-chain transition; `vmap` over chains; warmup reuses the dual
averaging + windowed Welford mass machinery from hmc.py.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import hmc as H

__all__ = ["nuts_kernel", "run_nuts", "sample_nuts"]


def _ckpt_tables(num_leaves: int):
    """Host-side tables for the iterative U-turn checkpoint scheme.

    For leaf index i in [0, num_leaves):
      - even i stores its state in slot popcount(i >> 1);
      - odd i checks turning against slots [idx_min, idx_max] where
        idx_max = popcount(i >> 1) and idx_min = idx_max − (trailing
        ones of i) + 1.
    """
    idx = np.arange(num_leaves, dtype=np.int64)
    popc = np.array([bin(v >> 1).count("1") for v in idx], np.int32)
    trail = np.empty(num_leaves, np.int32)
    for v in idx:
        t, x = 0, int(v)
        while x & 1:
            t += 1
            x >>= 1
        trail[v] = t
    is_odd = (idx % 2 == 1)
    store_slot = popc                      # used when even
    idx_max = popc                         # used when odd
    idx_min = idx_max - trail + 1
    return (store_slot.astype(np.int32), idx_min.astype(np.int32),
            idx_max.astype(np.int32), is_odd)


def _is_turning(v_left, v_right, rho):
    return jnp.logical_or(jnp.dot(v_left, rho) <= 0.0,
                          jnp.dot(v_right, rho) <= 0.0)


class _NutsInfo(NamedTuple):
    accept_prob: jnp.ndarray     # mean leaf α (dual-averaging statistic)
    is_divergent: jnp.ndarray
    depth: jnp.ndarray           # tree depth reached
    num_grads: jnp.ndarray       # leaves actually integrated (active)
    energy: jnp.ndarray          # Hamiltonian of the selected state
                                 # (Stan's energy__; E-BFMI series)


def nuts_kernel(potential_fn: Callable, max_tree_depth: int = 8,
                divergence_threshold: float = 1000.0,
                mass_structure: str = "diag"):
    """Build `one_step(z, key, step_size, inv_mass) -> (z_new, info)` for
    a single chain.

    With ``mass_structure="dense"`` the `inv_mass` argument is the
    `(Σ, R)` pair from `hmc.dense_mass_ops`, SHARED across the chain
    batch (vmap in_axes=(0, 0, 0, None)); the metric enters through
    the same four primitives as the diagonal case — momentum draw
    r = R·u, kinetic ½·rᵀΣr, drift ε·Σ·r, and the U-turn velocities
    v = Σ·r — so the tree machinery is metric-agnostic.
    """

    value_and_grad = jax.value_and_grad(potential_fn)

    if mass_structure == "dense":
        def _draw(k, D, dtype, m):
            return m[1] @ jax.random.normal(k, (D,), dtype)

        def _kin(r, m):
            return 0.5 * jnp.dot(r, m[0] @ r)

        def _vel(r, m):
            return m[0] @ r
    else:
        def _draw(k, D, dtype, m):
            return jax.random.normal(k, (D,), dtype) * jax.lax.rsqrt(m)

        def _kin(r, m):
            return 0.5 * jnp.sum(r * r * m)

        def _vel(r, m):
            return m * r

    def leapfrog_1(z, r, grad, eps, inv_mass):
        r_half = r - 0.5 * eps * grad
        z_new = z + eps * _vel(r_half, inv_mass)
        pot_new, grad_new = value_and_grad(z_new)
        r_new = r_half - 0.5 * eps * grad_new
        return z_new, r_new, pot_new, grad_new

    def one_step(z0, key, step_size, inv_mass):
        D = z0.shape[0]
        dtype = z0.dtype
        k_mom, k_loop = jax.random.split(key)
        pot0, grad0 = value_and_grad(z0)
        r0 = _draw(k_mom, D, dtype, inv_mass)
        energy0 = pot0 + _kin(r0, inv_mass)

        # trajectory state
        zL, rL, gL = z0, r0, grad0    # leftmost leaf
        zR, rR, gR = z0, r0, grad0    # rightmost leaf
        r_sum = r0
        cand_z = z0
        cand_energy = energy0
        log_w = jnp.zeros((), dtype)  # weight of initial point: e^0
        done = jnp.zeros((), bool)
        divergent = jnp.zeros((), bool)
        depth_reached = jnp.zeros((), jnp.int32)
        sum_alpha = jnp.zeros((), dtype)
        n_alpha = jnp.zeros((), dtype)
        num_grads = jnp.zeros((), dtype)

        for j in range(max_tree_depth):
            n_leaves = 2 ** j
            store_slot, idx_min, idx_max, is_odd = _ckpt_tables(n_leaves)
            k_loop, k_dir, k_sub, k_acc = jax.random.split(k_loop, 4)
            going_right = jax.random.bernoulli(k_dir)
            eps = jnp.where(going_right, step_size, -step_size)
            z_e = jnp.where(going_right, zR, zL)
            r_e = jnp.where(going_right, rR, rL)
            g_e = jnp.where(going_right, gR, gL)

            # ---- build subtree of n_leaves leaves iteratively --------
            ckpt_r = jnp.zeros((max_tree_depth, D), dtype)
            ckpt_rsum = jnp.zeros((max_tree_depth, D), dtype)

            sub0 = dict(
                z=z_e, r=r_e, grad=g_e,
                r_sum=jnp.zeros((D,), dtype),
                log_w=-jnp.inf * jnp.ones((), dtype),
                cand=z_e,  # overwritten by first leaf (weight −inf)
                cand_h=energy0,
                stop=done,  # if chain already done, subtree is a no-op
                div=jnp.zeros((), bool),
                ckpt_r=ckpt_r, ckpt_rsum=ckpt_rsum,
                s_alpha=jnp.zeros((), dtype),
                n_leaf=jnp.zeros((), dtype),
            )

            leaf_keys = jax.random.split(k_sub, n_leaves)

            def leaf_step(c, xs):
                slot, imin, imax, odd, lk = xs
                z_new, r_new, pot_new, grad_new = leapfrog_1(
                    c["z"], c["r"], c["grad"], eps, inv_mass)
                h = pot_new + _kin(r_new, inv_mass)
                dE = energy0 - h
                dE = jnp.where(jnp.isnan(dE), -jnp.inf, dE)
                div_leaf = -dE > divergence_threshold
                log_w_new = jnp.logaddexp(c["log_w"], dE)
                take = (jax.random.uniform(lk, (), dtype)
                        < jnp.exp(dE - log_w_new))
                r_sum_new = c["r_sum"] + r_new
                alpha = jnp.minimum(1.0, jnp.exp(jnp.minimum(dE, 0.0)))

                # checkpoint store (even leaves)
                do_store = jnp.logical_and(~odd, ~c["stop"])
                ck_r = jnp.where(
                    do_store,
                    c["ckpt_r"].at[slot].set(r_new),
                    c["ckpt_r"])
                ck_rs = jnp.where(
                    do_store,
                    c["ckpt_rsum"].at[slot].set(r_sum_new),
                    c["ckpt_rsum"])

                # turning checks (odd leaves) against slots imin..imax
                def slot_turn(s):
                    r_l = ck_r[s]
                    rho = (r_sum_new - ck_rs[s] + r_l
                           - 0.5 * (r_l + r_new))
                    return _is_turning(_vel(r_l, inv_mass),
                                       _vel(r_new, inv_mass), rho)

                turning = jnp.zeros((), bool)
                for s in range(max_tree_depth):
                    in_range = jnp.logical_and(s >= imin, s <= imax)
                    turning = jnp.logical_or(
                        turning,
                        jnp.logical_and(
                            jnp.logical_and(odd, in_range), slot_turn(s)))

                stop_new = jnp.logical_or(
                    c["stop"], jnp.logical_or(div_leaf, turning))
                upd = lambda new, old: jnp.where(c["stop"], old, new)  # noqa: E731
                c2 = dict(
                    z=upd(z_new, c["z"]),
                    r=upd(r_new, c["r"]),
                    grad=upd(grad_new, c["grad"]),
                    r_sum=upd(r_sum_new, c["r_sum"]),
                    log_w=upd(jnp.where(div_leaf, c["log_w"], log_w_new),
                              c["log_w"]),
                    cand=jnp.where(
                        jnp.logical_and(~c["stop"],
                                        jnp.logical_and(take, ~div_leaf)),
                        z_new, c["cand"]),
                    cand_h=jnp.where(
                        jnp.logical_and(~c["stop"],
                                        jnp.logical_and(take, ~div_leaf)),
                        h, c["cand_h"]),
                    stop=stop_new,
                    div=jnp.logical_or(c["div"], jnp.logical_and(
                        ~c["stop"], div_leaf)),
                    ckpt_r=ck_r, ckpt_rsum=ck_rs,
                    s_alpha=upd(c["s_alpha"] + alpha, c["s_alpha"]),
                    n_leaf=upd(c["n_leaf"] + 1.0, c["n_leaf"]),
                )
                return c2, None

            xs = (jnp.asarray(store_slot), jnp.asarray(idx_min),
                  jnp.asarray(idx_max), jnp.asarray(is_odd), leaf_keys)
            sub, _ = jax.lax.scan(leaf_step, sub0, xs)

            subtree_ok = jnp.logical_and(
                ~sub["div"],
                # stop due to turning inside the subtree also invalidates
                jnp.logical_or(~sub["stop"], done))
            active = ~done

            # biased progressive sampling between old trajectory and the
            # new subtree
            accept_new = (jax.random.uniform(k_acc, (), dtype)
                          < jnp.exp(sub["log_w"] - log_w))
            use_new = jnp.logical_and(
                active, jnp.logical_and(subtree_ok, accept_new))
            cand_z = jnp.where(use_new, sub["cand"], cand_z)
            cand_energy = jnp.where(use_new, sub["cand_h"], cand_energy)
            log_w_merged = jnp.logaddexp(log_w, sub["log_w"])

            # merge endpoints / momentum sum only if subtree valid
            merge = jnp.logical_and(active, subtree_ok)
            r_sum_new = jnp.where(merge, r_sum + sub["r_sum"], r_sum)
            zR = jnp.where(jnp.logical_and(merge, going_right),
                           sub["z"], zR)
            rR = jnp.where(jnp.logical_and(merge, going_right),
                           sub["r"], rR)
            gR = jnp.where(jnp.logical_and(merge, going_right),
                           sub["grad"], gR)
            zL = jnp.where(jnp.logical_and(merge, ~going_right),
                           sub["z"], zL)
            rL = jnp.where(jnp.logical_and(merge, ~going_right),
                           sub["r"], rL)
            gL = jnp.where(jnp.logical_and(merge, ~going_right),
                           sub["grad"], gL)
            log_w = jnp.where(merge, log_w_merged, log_w)
            r_sum = r_sum_new

            # whole-trajectory U-turn check after a successful merge
            rho = r_sum - 0.5 * (rL + rR)
            turned = _is_turning(_vel(rL, inv_mass),
                                 _vel(rR, inv_mass), rho)

            divergent = jnp.logical_or(divergent,
                                       jnp.logical_and(active, sub["div"]))
            sum_alpha = sum_alpha + jnp.where(active, sub["s_alpha"], 0.0)
            n_alpha = n_alpha + jnp.where(active, sub["n_leaf"], 0.0)
            num_grads = num_grads + jnp.where(active, sub["n_leaf"], 0.0)
            depth_reached = depth_reached + jnp.where(active, 1, 0)

            done = jnp.logical_or(
                done,
                jnp.logical_or(~subtree_ok,
                               jnp.logical_and(merge, turned)))

        accept_prob = sum_alpha / jnp.maximum(n_alpha, 1.0)
        info = _NutsInfo(accept_prob=accept_prob,
                         is_divergent=divergent,
                         depth=depth_reached,
                         num_grads=num_grads,
                         energy=cand_energy)
        return cand_z, info

    return one_step


def _chunked_scan(f, carry, xs, chunk):
    """`lax.scan` split into <=chunk-step pieces (bitwise-identical
    trajectory — the carry crosses chunk boundaries unchanged).

    Big NUTS programs (8192 chains x 2^depth leapfrogs x hundreds of
    steps on a dense likelihood) exceed the axon tunnel's single-XLA-
    execution fault threshold when run as one scan; chunked eager
    re-invocation reuses the compiled chunk program (at most two
    variants: the chunk and the remainder), so the only cost is one
    dispatch per chunk."""
    if chunk is None:
        return jax.lax.scan(f, carry, xs)
    n = jax.tree.leaves(xs)[0].shape[0]
    if n <= chunk:
        return jax.lax.scan(f, carry, xs)

    # Assemble chunk outputs into preallocated buffers via DONATED
    # in-place slice updates — concatenating parts at the end doubles
    # peak memory (all chunks + the result live at once), which OOMs
    # an 8192-chain × 1000-sample × ~100-dim collect (~3.2 GB) that
    # fits fine as one buffer.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _write(buf, part, i):
        return jax.lax.dynamic_update_slice_in_dim(buf, part, i, 0)

    bufs = None
    i = 0
    while i < n:
        j = min(i + chunk, n)
        carry, out = jax.lax.scan(f, carry,
                                  jax.tree.map(lambda a: a[i:j], xs))
        if bufs is None:
            bufs = jax.tree.map(
                lambda o: jnp.zeros((n,) + o.shape[1:], o.dtype), out)
        idx = jnp.int32(i)
        bufs = jax.tree.map(lambda b, o: _write(b, o, idx), bufs, out)
        i = j
    return carry, bufs


def sample_nuts(potential_fn: Callable, z0, key, num_samples: int,
                step_size, inv_mass, *,
                max_tree_depth: int = 8,
                step_jitter: float = 0.0,
                collect_fn: Optional[Callable] = None,
                scan_chunk: Optional[int] = 128,
                mass_structure: str = "diag"):
    """Post-adaptation NUTS sampling from an explicit state (resume
    point, mirroring hmc.sample_hmc).  `step_size` (C,) and `inv_mass`
    (C, D) are traced args (repo convention: learned arrays must not be
    jit closure constants), so a resume with different adapted values
    reuses the compiled program.  With `mass_structure="dense"`,
    `inv_mass` is the shared `(Σ, R)` pair instead of a (C, D) array.

    Returns (samples, z_final, (accept, divergent, depth, grads,
    energy)).
    Chains continue a run checkpointed by utils/checkpoint.py exactly
    where it stopped.
    """
    C, D = z0.shape
    kern = jax.vmap(nuts_kernel(potential_fn, max_tree_depth,
                                mass_structure=mass_structure),
                    in_axes=(0, 0, 0,
                             None if mass_structure == "dense" else 0))
    if collect_fn is None:
        collect_fn = lambda z: z  # noqa: E731

    def _jittered(ss, k):
        if step_jitter <= 0:
            return ss
        u = jax.random.uniform(k, (C,), minval=1.0 - step_jitter,
                               maxval=1.0 + step_jitter)
        return ss * u

    def sample_step(z, k):
        k, kj = jax.random.split(k)
        keys = jax.random.split(k, C)
        z, info = kern(z, keys, _jittered(step_size, kj), inv_mass)
        return z, (jax.vmap(collect_fn)(z), info.accept_prob,
                   info.is_divergent, info.depth, info.num_grads,
                   info.energy)

    z_final, (samples, acc, div, depth, grads, energy) = _chunked_scan(
        sample_step, z0, jax.random.split(key, num_samples), scan_chunk)
    return samples, z_final, (acc, div, depth, grads, energy)


def run_nuts(potential_fn: Callable,
             init_positions,      # (C, D)
             key,
             *,
             num_warmup: int = 1000,
             num_samples: int = 1000,
             max_tree_depth: int = 8,
             target_accept: float = 0.8,
             init_step_size: float = 0.1,
             adapt_mass: bool = True,
             share_adaptation: bool = False,
             inv_mass_diag=None,
             collect_fn: Optional[Callable] = None,
             scan_chunk: Optional[int] = 128,
             step_jitter: float = 0.2,
             step_jitter_warmup: bool = False,
             pooled_accept_stat: str = "geom",
             mass_structure: str = "diag",
             dense_mask=None):
    """Warmup + sampling (same driver structure as run_hmc;
    NUTS-standard target acceptance 0.8), scans chunked to bound the
    single-execution program length (see _chunked_scan).

    `share_adaptation=True` pools warmup across the chain batch (one
    step size from the cross-chain pooled acceptance, ensemble mass) —
    the same scheme as HMCConfig.share_adaptation, via hmc.adapt_step.
    The pooled-step mitigations mirror HMCConfig (hmc.py): when the
    step size is POOLED, every chain shares one ε, so `step_jitter`
    applies per-chain multiplicative jitter (uniform in [1−j, 1+j]) in
    the sampling phase — NUTS's random tree depth decoheres trajectory
    *lengths* but all chains still leapfrog at the identical frozen ε,
    and the shared-scale resonance HMC measured (PERF.md "pooled
    (arith)" column) has the same mechanism here.  `pooled_accept_stat`
    selects the cross-chain acceptance pool ("geom" floored / "arith" /
    "harm"; see hmc.adapt_step).
    """
    C, D = init_positions.shape
    dtype = init_positions.dtype
    dense = mass_structure == "dense"
    kern = jax.vmap(nuts_kernel(potential_fn, max_tree_depth,
                                mass_structure=mass_structure),
                    in_axes=(0, 0, 0, None if dense else 0))

    share_step = share_adaptation is True or share_adaptation == "all"
    jitter = step_jitter if share_step else 0.0

    def _jittered(step_size, key):
        if jitter <= 0:
            return step_size
        u = jax.random.uniform(key, (C,), minval=1.0 - jitter,
                               maxval=1.0 + jitter)
        return step_size * u

    if dense:
        # dense metric: one shared (Σ, R) pair, pooled dense ensemble
        # Welford during the slow windows — same scheme as
        # hmc._run_hmc_dense, same scale-guard mask semantics.
        if inv_mass_diag is None:
            diag0 = jnp.ones((D,), dtype)
        else:
            dmat = jnp.asarray(inv_mass_diag, dtype)
            diag0 = jnp.mean(dmat, axis=0) if dmat.ndim > 1 else dmat
        eye = jnp.eye(D, dtype=dtype)
        inv_mass0 = (eye * diag0[None, :],
                     eye * jax.lax.rsqrt(jnp.clip(diag0, 1e-12,
                                                  None))[None, :])
    elif inv_mass_diag is None:
        inv_mass0 = jnp.ones((C, D), dtype)
    else:
        inv_mass0 = jnp.broadcast_to(jnp.asarray(inv_mass_diag, dtype),
                                     (C, D))

    da0 = H.da_init(jnp.full((C,), init_step_size, dtype))
    wf0 = (H.dense_welford_init(D, dtype) if dense
           else H.WelfordState(jnp.zeros((C, D), dtype),
                               jnp.zeros((C, D), dtype),
                               jnp.zeros((C,), dtype)))
    is_slow, is_end = H.warmup_schedule(num_warmup)
    is_slow, is_end = jnp.asarray(is_slow), jnp.asarray(is_end)

    def warm_step(carry, xs):
        z, da, wf, inv_mass = carry
        key, slow, end = xs
        key, kj = jax.random.split(key)
        keys = jax.random.split(key, C)
        step_size = jnp.exp(da.log_eps)
        if step_jitter_warmup:
            step_size = _jittered(step_size, kj)
        z, info = kern(z, keys, step_size, inv_mass)
        if dense:
            da, _, _ = H.adapt_step(
                da, None, None, z, info.accept_prob, slow, end,
                target_accept=target_accept, adapt_mass=False,
                share=share_adaptation, pooled_stat=pooled_accept_stat)
            if adapt_mass:
                sigma, r_fac = inv_mass
                wf_new = H.dense_welford_update(wf, z)
                wf = jax.tree.map(lambda a, b: jnp.where(slow, b, a),
                                  wf, wf_new)
                sig_new, rfac_new = H.dense_mass_ops(
                    H.dense_welford_cov(wf), dense_mask=dense_mask)
                sigma = jnp.where(end, sig_new, sigma)
                r_fac = jnp.where(end, rfac_new, r_fac)
                wf = jax.tree.map(
                    lambda a: jnp.where(end, jnp.zeros_like(a), a), wf)
                da = jax.tree.map(
                    lambda a, b: jnp.where(end, b, a), da,
                    H.da_init(jnp.exp(da.log_eps)))
                inv_mass = (sigma, r_fac)
        else:
            da, wf, inv_mass = H.adapt_step(
                da, wf, inv_mass, z, info.accept_prob, slow, end,
                target_accept=target_accept, adapt_mass=adapt_mass,
                share=share_adaptation, pooled_stat=pooled_accept_stat)
        return (z, da, wf, inv_mass), info.accept_prob

    key, kw, ks = jax.random.split(key, 3)
    z0 = init_positions
    stuck = jnp.zeros((C,), bool)
    if num_warmup > 0:
        (z0, da0, _, inv_mass0), warm_accept = _chunked_scan(
            warm_step, (z0, da0, wf0, inv_mass0),
            (jax.random.split(kw, num_warmup), is_slow, is_end),
            scan_chunk)
        step_final = jnp.exp(da0.log_eps_bar)
        if share_adaptation is True or share_adaptation == "all":
            # pooled step sizes have no per-chain escape hatch; teleport
            # chains that ended warmup stuck (see hmc.rescue_stuck_chains)
            z0, stuck = H.rescue_stuck_chains(
                z0, warm_accept, jax.random.fold_in(key, 7))
    else:
        step_final = jnp.full((C,), init_step_size, dtype)

    samples, z_final, (acc, div, depth, grads, energy) = sample_nuts(
        potential_fn, z0, ks, num_samples, step_final, inv_mass0,
        max_tree_depth=max_tree_depth, step_jitter=jitter,
        collect_fn=collect_fn, scan_chunk=scan_chunk,
        mass_structure=mass_structure)

    stats = {
        "step_size": step_final,
        "inv_mass_diag": (jnp.broadcast_to(jnp.diagonal(inv_mass0[0]),
                                           (C, D))
                          if dense else inv_mass0),
        **({"inv_mass_dense": inv_mass0[0]} if dense else {}),
        "accept_prob": acc,
        "divergences": div,
        "tree_depth": depth,
        "energy": energy,                        # (S, C)
        "rescued_chains": stuck,
        "num_grad_evals_per_sample": jnp.mean(grads),
        "final_position": z_final,
    }
    return samples, stats
