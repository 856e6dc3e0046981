"""Numerical-safety debug mode (SURVEY.md §6 "Race detection /
sanitizers" row: XLA is data-race-free by construction, so the TPU
equivalent of sanitizers is NaN trapping + shape/finiteness assertions).
"""

from __future__ import annotations

import contextlib

import chex
import jax
import jax.numpy as jnp

__all__ = ["debug_mode", "assert_finite_tree", "check_potential"]


@contextlib.contextmanager
def debug_mode(nans: bool = True):
    """Enable jax NaN debugging inside the block (slows execution;
    intended for CI and repro sessions, not production runs)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def assert_finite_tree(tree, name: str = "tree"):
    """Host-side finiteness check over a pytree (post-run validation)."""
    leaves = jax.tree.leaves(tree)
    for i, leaf in enumerate(leaves):
        arr = jnp.asarray(leaf)
        if not bool(jnp.all(jnp.isfinite(arr))):
            raise FloatingPointError(
                f"{name}: leaf {i} contains non-finite values")


def check_potential(potential_fn, z, name: str = "potential"):
    """Value+grad finiteness check at a point (pre-flight validation of
    a model × transform combination before launching a long run)."""
    u, g = jax.value_and_grad(potential_fn)(z)
    chex.assert_rank(u, 0)
    chex.assert_equal_shape([z, g])
    if not bool(jnp.isfinite(u)):
        raise FloatingPointError(f"{name}: U(z0) is not finite")
    if not bool(jnp.all(jnp.isfinite(g))):
        raise FloatingPointError(f"{name}: grad U(z0) has non-finite "
                                 "entries")
    return float(u)
