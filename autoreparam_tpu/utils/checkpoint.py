"""Sampler-state checkpoint/resume via orbax (SURVEY.md §6).

The reference's only persistence was result files; long TPU runs here
checkpoint the full sampler state (chain positions, potential/grad,
adapted step sizes, diagonal mass, PRNG key, chunk counter) so a
preempted TPU VM resumes mid-run without redoing warmup.

Pattern: warmup once → sample in chunks of `chunk_size` → orbax-save
state + append samples (.npy per chunk) after each chunk.  `resume()`
restores the newest checkpoint and continues.
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..inference import hmc as H

__all__ = ["ResumableHMC"]


class _RunState(NamedTuple):
    z: jnp.ndarray
    pot: jnp.ndarray
    grad: jnp.ndarray
    step_size: jnp.ndarray
    inv_mass: jnp.ndarray
    key: jnp.ndarray
    chunks_done: jnp.ndarray  # scalar int32


class ResumableHMC:
    """Chunked HMC with orbax checkpoints between chunks."""

    def __init__(self, potential_fn: Callable, config: H.HMCConfig,
                 ckpt_dir: str, chunk_size: int = 200):
        import orbax.checkpoint as ocp

        self.potential_fn = potential_fn
        self.config = config
        self.chunk_size = chunk_size
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            os.path.join(self.ckpt_dir, "state"),
            options=ocp.CheckpointManagerOptions(max_to_keep=2))

    # -- persistence ----------------------------------------------------
    def _save(self, step: int, rs: _RunState):
        import orbax.checkpoint as ocp

        self._mngr.save(step, args=ocp.args.StandardSave(rs._asdict()))
        self._mngr.wait_until_finished()

    def _latest(self) -> Optional[int]:
        return self._mngr.latest_step()

    def _restore(self, template: _RunState) -> _RunState:
        import orbax.checkpoint as ocp

        step = self._latest()
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(template._asdict()))
        return _RunState(**restored)

    def _chunk_path(self, i: int) -> str:
        return os.path.join(self.ckpt_dir, f"samples_{i:05d}.npy")

    # -- run ------------------------------------------------------------
    def run(self, init_positions, key, num_samples: int):
        """Run (or resume) until `num_samples` per chain are collected.

        Returns samples (num_samples, C, D) assembled from all chunks.
        """
        cfg = self.config
        C, D = init_positions.shape
        n_chunks = -(-num_samples // self.chunk_size)

        template = _RunState(
            z=jnp.zeros((C, D)), pot=jnp.zeros((C,)),
            grad=jnp.zeros((C, D)), step_size=jnp.zeros((C,)),
            inv_mass=jnp.zeros((C, D)), key=jax.random.PRNGKey(0),
            chunks_done=jnp.zeros((), jnp.int32))

        if self._latest() is not None:
            rs = self._restore(template)
        else:
            k_warm, key = jax.random.split(key)
            state, step_size, inv_mass = H.warmup_hmc(
                self.potential_fn, init_positions, k_warm, cfg)
            rs = _RunState(z=state.z, pot=state.pot, grad=state.grad,
                           step_size=step_size, inv_mass=inv_mass,
                           key=key, chunks_done=jnp.zeros((), jnp.int32))
            self._save(0, rs)

        # step_size/inv_mass are traced args (repo convention: learned
        # arrays must not be jit closure constants — a resume with
        # different adapted values would change the HLO and miss the
        # persistent compile cache on this slow host)
        sample_chunk = jax.jit(
            lambda st, k, ss, im: H.sample_hmc(
                self.potential_fn, st, k, self.chunk_size,
                cfg.num_leapfrog_steps, ss, im))

        start = int(rs.chunks_done)
        for i in range(start, n_chunks):
            k_chunk, new_key = jax.random.split(rs.key)
            state = H.HMCState(rs.z, rs.pot, rs.grad)
            samples, state, _ = sample_chunk(state, k_chunk,
                                             rs.step_size, rs.inv_mass)
            np.save(self._chunk_path(i), np.asarray(samples))
            rs = rs._replace(z=state.z, pot=state.pot, grad=state.grad,
                             key=new_key,
                             chunks_done=jnp.asarray(i + 1, jnp.int32))
            self._save(i + 1, rs)

        chunks = [np.load(self._chunk_path(i)) for i in range(n_chunks)]
        return np.concatenate(chunks, axis=0)[:num_samples]
