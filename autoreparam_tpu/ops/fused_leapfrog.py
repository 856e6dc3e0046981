"""Pallas TPU kernel: fused multi-step leapfrog integrator.

The hot loop of every HMC transition (SURVEY.md §4.1 ★) is L leapfrog
steps, each needing ∇U.  The XLA path (inference/hmc.py `leapfrog`)
scans the steps, writing (z, r) back to HBM between iterations.  This
kernel keeps a block of chains' full phase-space state **resident in
VMEM for all L steps** — positions, momenta, and gradients never touch
HBM mid-trajectory.

The potential is a plain jnp function; `jax.vmap(jax.grad(...))` is
traced *inside* the kernel body, so the model's gradient math lowers to
Mosaic ops on VMEM values.  Model data the potential closes over
(sufficient-stat tables, index tables) is hoisted by closure conversion
and enters the kernel as grid-invariant VMEM operands — every zoo
model's data is KB-scale after the sufficient-stat collapses, so real
models (radon, election88) run fused, not just synthetic potentials.
Models with dynamic gathers in the gradient keep the XLA path (the
one-hot matmul lowering, models/zoo.py take(), avoids that by
construction) — this stays a flag-gated fast path with a mandatory
equivalence test (tests/test_pallas.py), per SURVEY.md §3.2/§5 item 6.

Chain blocking: grid over C/block rows; D is padded to the 128-lane
boundary by the caller (pad dims carry zero momentum and zero gradient,
so they are inert in the dynamics).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_fused_leapfrog", "make_fused_transition", "pad_dim"]


def pad_dim(d: int, multiple: int = 128) -> int:
    return ((d + multiple - 1) // multiple) * multiple


def _hoist_constants(potential_fn: Callable, dim: int):
    """Split `potential_fn` into (pure_fn, consts) via closure
    conversion.  Real-model potentials close over data arrays (radon's
    sufficient-stat tables, election88's one-hot index tables, …) which
    Pallas refuses to capture into the kernel — they must enter as
    pallas_call operands.  Returns the converted function
    `pure_fn(z, *consts)`, the concrete consts reshaped to 2-D (TPU
    Pallas VMEM refs want ≥2-D blocks), and their original shapes so
    the kernel body can reshape them back."""
    closed = jax.make_jaxpr(potential_fn)(jnp.zeros((dim,), jnp.float32))
    consts = [jnp.asarray(c) for c in closed.consts]

    def pure_fn(z, *cs):
        (out,) = jax.core.eval_jaxpr(closed.jaxpr, list(cs), z)
        return out

    shapes = [c.shape for c in consts]
    consts2d = [jnp.asarray(c).reshape(
        (1, 1) if c.ndim == 0 else (1, -1) if c.ndim == 1 else c.shape)
        for c in consts]
    return pure_fn, consts2d, shapes


def _const_specs(consts2d):
    """Whole-array, grid-invariant VMEM blocks for hoisted model data
    (small: ≤ a few thousand elements for every zoo model)."""
    return [pl.BlockSpec(c.shape, lambda i, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM) for c in consts2d]


def make_fused_leapfrog(potential_fn: Callable, num_steps: int,
                        dim: int, block_chains: int = 256,
                        interpret: bool = False):
    """Build fused_leapfrog(z, r, grad, step_size, inv_mass) -> (z, r,
    pot, grad), matching inference.hmc.leapfrog's contract but running
    all `num_steps` in VMEM.

    `potential_fn` takes a (dim,) vector.  Inputs are (C, dim) with C a
    multiple of `block_chains`; step_size is (C,), inv_mass (C, dim).
    """
    pure_fn, consts2d, const_shapes = _hoist_constants(potential_fn, dim)

    def kernel(z_ref, r_ref, grad_ref, eps_ref, im_ref, *rest):
        c_refs = rest[:len(consts2d)]
        z_out, r_out, pot_out, grad_out = rest[len(consts2d):]
        cs = [cr[:].reshape(s) for cr, s in zip(c_refs, const_shapes)]
        vgrad = jax.vmap(jax.grad(lambda zz: pure_fn(zz, *cs)))
        vpot = jax.vmap(lambda zz: pure_fn(zz, *cs))
        z = z_ref[:]
        r = r_ref[:]
        grad = grad_ref[:]
        eps = eps_ref[:]          # (B, 1)
        inv_mass = im_ref[:]      # (B, D)

        def body(_, carry):
            z, r, grad = carry
            r_half = r - 0.5 * eps * grad
            z_new = z + eps * inv_mass * r_half
            grad_new = vgrad(z_new)
            r_new = r_half - 0.5 * eps * grad_new
            return (z_new, r_new, grad_new)

        z, r, grad = jax.lax.fori_loop(0, num_steps, body, (z, r, grad))
        z_out[:] = z
        r_out[:] = r
        pot_out[:] = vpot(z)[:, None]
        grad_out[:] = grad

    @jax.jit
    def fused(z, r, grad, step_size, inv_mass):
        C, D = z.shape
        assert D == dim, (D, dim)
        B = min(block_chains, C)
        grid = (C // B,)
        spec2 = pl.BlockSpec((B, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        spec1 = pl.BlockSpec((B, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        z_o, r_o, pot_o, grad_o = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec2, spec2, spec2, spec1, spec2]
            + _const_specs(consts2d),
            out_specs=[spec2, spec2, spec1, spec2],
            out_shape=[
                jax.ShapeDtypeStruct((C, D), z.dtype),
                jax.ShapeDtypeStruct((C, D), z.dtype),
                jax.ShapeDtypeStruct((C, 1), z.dtype),
                jax.ShapeDtypeStruct((C, D), z.dtype),
            ],
            interpret=interpret,
        )(z, r, grad, step_size[:, None], inv_mass, *consts2d)
        return z_o, r_o, pot_o[:, 0], grad_o

    return fused


def make_fused_transition(potential_fn: Callable, num_steps: int,
                          dim: int, block_chains: int = 256,
                          divergence_threshold: float = 1000.0,
                          interpret: bool = False):
    """Whole HMC transition in ONE Pallas call: momentum refresh from
    pre-sampled standard normals, L leapfrog steps, both Hamiltonian
    energies, and the Metropolis select — nothing but the old state and
    the RNG draws crosses HBM inbound, nothing but the new state and
    (C,)-sized stats outbound.  This is the "fuse momentum refresh +
    energy into the kernel" step the bench A/B asked for: the partial
    kernel (make_fused_leapfrog) still round-trips 4 (C, D) trajectory
    arrays to XLA for the accept logic and reads 3 back.

    RNG stays OUTSIDE (jax.random is threefry in XLA; Pallas's on-core
    PRNG is a different bitstream) so the fused path is bit-comparable
    to vmap(inference.hmc.hmc_kernel) given the same keys — the
    equivalence test in tests/test_pallas.py relies on that.

    fused(z, pot, grad, normals, u, step_size, inv_mass) ->
        (z', pot', grad', accept_prob, accepted, divergent, energy)
    with accepted/divergent returned as {0,1} floats (TPU Pallas outputs
    are vector-register shaped; callers cast to bool).
    """
    pure_fn, consts2d, const_shapes = _hoist_constants(potential_fn, dim)

    def kernel(z_ref, pot_ref, grad_ref, n_ref, u_ref, eps_ref, im_ref,
               *rest):
        c_refs = rest[:len(consts2d)]
        (z_out, pot_out, grad_out, ap_out, acc_out, div_out,
         en_out) = rest[len(consts2d):]
        cs = [cr[:].reshape(s) for cr, s in zip(c_refs, const_shapes)]
        vpg = jax.vmap(jax.value_and_grad(lambda zz: pure_fn(zz, *cs)))
        z = z_ref[:]
        pot0 = pot_ref[:][:, 0]
        grad = grad_ref[:]
        eps = eps_ref[:]          # (B, 1)
        inv_mass = im_ref[:]      # (B, D)
        r = n_ref[:] * jax.lax.rsqrt(inv_mass)
        energy0 = pot0 + 0.5 * jnp.sum(r * r * inv_mass, axis=-1)

        def body(_, carry):
            z, r, grad, _pot = carry
            r_half = r - 0.5 * eps * grad
            z_new = z + eps * inv_mass * r_half
            pot_new, grad_new = vpg(z_new)
            r_new = r_half - 0.5 * eps * grad_new
            return (z_new, r_new, grad_new, pot_new)

        z1, r1, grad1, pot1 = jax.lax.fori_loop(
            0, num_steps, body, (z, r, grad, pot0))
        energy1 = pot1 + 0.5 * jnp.sum(r1 * r1 * inv_mass, axis=-1)
        delta = energy0 - energy1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0)))
        divergent = -delta > divergence_threshold
        accept = u_ref[:][:, 0] < accept_prob
        acc2 = accept[:, None]
        z_out[:] = jnp.where(acc2, z1, z)
        pot_out[:] = jnp.where(accept, pot1, pot0)[:, None]
        grad_out[:] = jnp.where(acc2, grad1, grad)
        ap_out[:] = accept_prob[:, None]
        acc_out[:] = accept[:, None].astype(z.dtype)
        div_out[:] = divergent[:, None].astype(z.dtype)
        # post-accept Hamiltonian (Stan's energy__), matching hmc_kernel
        en_out[:] = jnp.where(accept, energy1, energy0)[:, None]

    @jax.jit
    def fused(z, pot, grad, normals, u, step_size, inv_mass):
        C, D = z.shape
        assert D == dim, (D, dim)
        B = min(block_chains, C)
        grid = (C // B,)
        spec2 = pl.BlockSpec((B, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        spec1 = pl.BlockSpec((B, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        col = jax.ShapeDtypeStruct((C, 1), z.dtype)
        full = jax.ShapeDtypeStruct((C, D), z.dtype)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec2, spec1, spec2, spec2, spec1, spec1, spec2]
            + _const_specs(consts2d),
            out_specs=[spec2, spec1, spec2, spec1, spec1, spec1, spec1],
            out_shape=[full, col, full, col, col, col, col],
            interpret=interpret,
        )(z, pot[:, None], grad, normals, u[:, None],
          step_size[:, None], inv_mass, *consts2d)
        z1, pot1, grad1, ap, acc, div, en = outs
        return (z1, pot1[:, 0], grad1, ap[:, 0], acc[:, 0], div[:, 0],
                en[:, 0])

    return fused


def fused_hmc_kernel(potential_fn: Callable, num_leapfrog_steps: int,
                     dim: int, block_chains: int = 256,
                     divergence_threshold: float = 1000.0,
                     interpret: bool = False):
    """Batched HMC transition using the fully-fused Pallas kernel.

    Contract matches vmap(inference.hmc.hmc_kernel(...)): takes batched
    (state, keys, step_size, inv_mass), returns (state, info) — so the
    two paths are drop-in interchangeable (and equivalence-tested).
    Key handling mirrors hmc.hmc_kernel exactly (split -> momentum key,
    accept key) so given the same per-chain keys the draws are
    identical.
    """
    from ..inference.hmc import HMCInfo, HMCState

    fused = make_fused_transition(
        potential_fn, num_leapfrog_steps, dim, block_chains,
        divergence_threshold=divergence_threshold, interpret=interpret)

    def one_step(state: "HMCState", keys, step_size, inv_mass):
        key_mom = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        key_acc = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
        normals = (jax.vmap(lambda k, s: jax.random.normal(k, s.shape,
                                                           s.dtype))
                   (key_mom, state.z))
        u = jax.vmap(lambda k: jax.random.uniform(k, ()))(key_acc)
        z1, pot1, grad1, ap, acc, div, energy = fused(
            state.z, state.pot, state.grad, normals, u, step_size,
            inv_mass)
        new_state = HMCState(z=z1, pot=pot1, grad=grad1)
        info = HMCInfo(accept_prob=ap, is_accepted=acc.astype(bool),
                       is_divergent=div.astype(bool), energy=energy,
                       step_size=step_size)
        return new_state, info

    return one_step
