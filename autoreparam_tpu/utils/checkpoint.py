"""Sampler-state checkpoint/resume via orbax (SURVEY.md §6).

The reference's only persistence was result files; long TPU runs here
checkpoint the full sampler state (chain positions, potential/grad,
adapted step sizes, diagonal mass, PRNG key, chunk counter) so a
preempted TPU VM resumes mid-run without redoing warmup.

Pattern (all engines): warmup once → sample in chunks of `chunk_size`
→ orbax-save state + append samples (.npy per chunk) after each chunk.
`run()` restores the newest checkpoint if one exists and continues.
Engines: `ResumableHMC`, `ResumableNUTS`, `ResumableChEES`,
`ResumableGHMC` — NUTS/ChEES/GHMC are the configurations that actually
run long at 8192 chains (BASELINE config #5 / the bench pipeline), so
preemption cover there matters most.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..inference import hmc as H

__all__ = ["ResumableHMC", "ResumableNUTS", "ResumableChEES",
           "ResumableGHMC"]


class _ResumableSampler:
    """Shared chunked-run / orbax-persistence driver.

    Subclasses define the engine via three hooks over a dict state
    (str → jnp array; must contain every array needed to continue):

    - `_template(C, D)` — zero-filled state dict fixing shapes/dtypes
      for orbax restore.
    - `_warmup(init_positions, key)` — run adaptation, return the
      state dict at the start of sampling.
    - `_sample_chunk(state, key, start)` — draw `chunk_size` samples
      from `state`; return (samples, new_state).  `start` is the
      global sample offset of this chunk (static int — used e.g. for
      ChEES's Halton continuation); learned arrays must be passed as
      traced args inside, per the repo's compile-cache convention.
    """

    def __init__(self, ckpt_dir: str, chunk_size: int):
        import orbax.checkpoint as ocp

        self.chunk_size = chunk_size
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            os.path.join(self.ckpt_dir, "state"),
            options=ocp.CheckpointManagerOptions(max_to_keep=2))

    # -- persistence ----------------------------------------------------
    def _save(self, step: int, state: dict):
        import orbax.checkpoint as ocp

        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()

    def _latest(self) -> Optional[int]:
        return self._mngr.latest_step()

    def _restore(self, template: dict) -> dict:
        import orbax.checkpoint as ocp

        return self._mngr.restore(
            self._latest(), args=ocp.args.StandardRestore(template))

    def _chunk_path(self, i: int) -> str:
        return os.path.join(self.ckpt_dir, f"samples_{i:05d}.npy")

    # -- run ------------------------------------------------------------
    def run(self, init_positions, key, num_samples: int):
        """Run (or resume) until `num_samples` per chain are collected.

        Returns samples (num_samples, C, D) assembled from all chunks.
        """
        C, D = init_positions.shape
        n_chunks = -(-num_samples // self.chunk_size)

        if self._latest() is not None:
            state = self._restore(self._template(C, D))
        else:
            k_warm, key = jax.random.split(key)
            state = self._warmup(init_positions, k_warm)
            state["key"] = key
            state["chunks_done"] = jnp.zeros((), jnp.int32)
            self._save(0, state)

        start = int(state["chunks_done"])
        for i in range(start, n_chunks):
            k_chunk, new_key = jax.random.split(state["key"])
            samples, state = self._sample_chunk(
                state, k_chunk, i * self.chunk_size)
            np.save(self._chunk_path(i), np.asarray(samples))
            state["key"] = new_key
            state["chunks_done"] = jnp.asarray(i + 1, jnp.int32)
            self._save(i + 1, state)

        chunks = [np.load(self._chunk_path(i)) for i in range(n_chunks)]
        return np.concatenate(chunks, axis=0)[:num_samples]

    def run_until(self, init_positions, key, *,
                  max_samples: int,
                  min_samples: int = 0,
                  rhat_bar: float = 1.01,
                  diag_fn: Optional[Callable] = None):
        """Convergence-gated sampling: draw chunks until the diagnostic
        passes (default: max rank-normalized split R-hat over dims <
        `rhat_bar`) or `max_samples` per chain are collected.

        The reference's answer to a non-converged run was a longer
        rerun by hand (SURVEY.md §6 failure-recovery row); this driver
        extends the SAME run — warmup is paid once, every chunk is
        checkpointed (preemption-safe, identical resume semantics to
        `run()`), and the gate re-evaluates on ALL accumulated samples
        after each chunk past `min_samples`.

        `diag_fn(samples) -> float` overrides the gate statistic
        (samples: (S, C, D) accumulated so far, z-space); stop when it
        is `< rhat_bar`.  Returns (samples, info) with info recording
        the per-check history, the final statistic, and whether the
        gate passed within budget.
        """
        from ..inference import diagnostics as dg

        if diag_fn is None:
            diag_fn = lambda s: float(  # noqa: E731
                np.asarray(dg.rhat_rank(jnp.asarray(s))).max())

        C, D = init_positions.shape
        max_chunks = -(-max_samples // self.chunk_size)

        if self._latest() is not None:
            state = self._restore(self._template(C, D))
        else:
            k_warm, key = jax.random.split(key)
            state = self._warmup(init_positions, k_warm)
            state["key"] = key
            state["chunks_done"] = jnp.zeros((), jnp.int32)
            self._save(0, state)

        start = int(state["chunks_done"])
        chunks = [np.load(self._chunk_path(i)) for i in range(start)]
        history = []
        passed = False
        for i in range(start, max_chunks):
            k_chunk, new_key = jax.random.split(state["key"])
            samples, state = self._sample_chunk(
                state, k_chunk, i * self.chunk_size)
            np.save(self._chunk_path(i), np.asarray(samples))
            state["key"] = new_key
            state["chunks_done"] = jnp.asarray(i + 1, jnp.int32)
            self._save(i + 1, state)
            chunks.append(np.asarray(samples))
            total = sum(c.shape[0] for c in chunks)
            if total >= max(min_samples, 8):  # rhat needs a few draws
                stat = diag_fn(np.concatenate(chunks, axis=0))
                history.append({"num_samples": int(total),
                                "stat": float(stat)})
                if stat < rhat_bar:
                    passed = True
                    break

        out = np.concatenate(chunks, axis=0)
        info = {"converged": passed,
                "num_samples": int(out.shape[0]),
                "rhat_bar": rhat_bar,
                "history": history,
                "final_stat": history[-1]["stat"] if history else None}
        return out, info


class ResumableHMC(_ResumableSampler):
    """Chunked fixed-L HMC with orbax checkpoints between chunks."""

    def __init__(self, potential_fn: Callable, config: H.HMCConfig,
                 ckpt_dir: str, chunk_size: int = 200):
        super().__init__(ckpt_dir, chunk_size)
        if getattr(config, "mass_structure", "diag") == "dense":
            # the checkpoint template stores a (C, D) diagonal mass;
            # silently resuming a dense-metric run with its diagonal
            # would change the kernel mid-run.  Fail loudly until the
            # (D, D) state is part of the template.
            raise NotImplementedError(
                "ResumableHMC does not yet support "
                "mass_structure='dense' (checkpoint template stores a "
                "diagonal mass); run with the diagonal metric or "
                "without checkpointing")
        self.potential_fn = potential_fn
        self.config = config
        # step_size/inv_mass are traced args (repo convention: learned
        # arrays must not be jit closure constants — a resume with
        # different adapted values would change the HLO and miss the
        # persistent compile cache on this slow host)
        self._sample_jit = jax.jit(
            lambda st, k, ss, im: H.sample_hmc(
                self.potential_fn, st, k, self.chunk_size,
                self.config.num_leapfrog_steps, ss, im))

    def _template(self, C, D):
        return dict(
            z=jnp.zeros((C, D)), pot=jnp.zeros((C,)),
            grad=jnp.zeros((C, D)), step_size=jnp.zeros((C,)),
            inv_mass=jnp.zeros((C, D)), key=jax.random.PRNGKey(0),
            chunks_done=jnp.zeros((), jnp.int32))

    def _warmup(self, init_positions, key):
        state, step_size, inv_mass = H.warmup_hmc(
            self.potential_fn, init_positions, key, self.config)
        return dict(z=state.z, pot=state.pot, grad=state.grad,
                    step_size=step_size, inv_mass=inv_mass)

    def _sample_chunk(self, state, key, start):
        hmc_state = H.HMCState(state["z"], state["pot"], state["grad"])
        samples, new_state, _ = self._sample_jit(
            hmc_state, key, state["step_size"], state["inv_mass"])
        state = dict(state, z=new_state.z, pot=new_state.pot,
                     grad=new_state.grad)
        return samples, state


class ResumableNUTS(_ResumableSampler):
    """Chunked NUTS with orbax checkpoints between chunks (the engine
    BASELINE config #5 runs at 8192 chains — the long-run case)."""

    def __init__(self, potential_fn: Callable, ckpt_dir: str,
                 chunk_size: int = 200, *,
                 num_warmup: int = 1000, max_tree_depth: int = 8,
                 target_accept: float = 0.8,
                 share_adaptation: object = False,
                 step_jitter: float = 0.2,
                 init_step_size: float = 0.1,
                 inv_mass_diag=None,
                 scan_chunk: Optional[int] = 128):
        super().__init__(ckpt_dir, chunk_size)
        from ..inference import nuts as N

        self.potential_fn = potential_fn
        self.num_warmup = num_warmup
        self.max_tree_depth = max_tree_depth
        self.target_accept = target_accept
        self.share_adaptation = share_adaptation
        self.init_step_size = init_step_size
        self.inv_mass_diag = inv_mass_diag
        share_step = (share_adaptation is True
                      or share_adaptation == "all")
        self.step_jitter = step_jitter if share_step else 0.0
        self.scan_chunk = scan_chunk
        self._N = N

    def _template(self, C, D):
        return dict(
            z=jnp.zeros((C, D)), step_size=jnp.zeros((C,)),
            inv_mass=jnp.zeros((C, D)), key=jax.random.PRNGKey(0),
            chunks_done=jnp.zeros((), jnp.int32))

    def _warmup(self, init_positions, key):
        # warmup-only run (mirrors warmup_hmc's num_samples=1 trick):
        # one throwaway sample so run_nuts's driver stays untouched
        _, stats = self._N.run_nuts(
            self.potential_fn, init_positions, key,
            num_warmup=self.num_warmup, num_samples=1,
            max_tree_depth=self.max_tree_depth,
            target_accept=self.target_accept,
            share_adaptation=self.share_adaptation,
            init_step_size=self.init_step_size,
            inv_mass_diag=self.inv_mass_diag,
            step_jitter=self.step_jitter,
            scan_chunk=self.scan_chunk)
        return dict(z=stats["final_position"],
                    step_size=stats["step_size"],
                    inv_mass=stats["inv_mass_diag"])

    def _sample_chunk(self, state, key, start):
        samples, z_final, _ = self._N.sample_nuts(
            self.potential_fn, state["z"], key, self.chunk_size,
            state["step_size"], state["inv_mass"],
            max_tree_depth=self.max_tree_depth,
            step_jitter=self.step_jitter,
            scan_chunk=self.scan_chunk)
        return samples, dict(state, z=z_final)


class ResumableChEES(_ResumableSampler):
    """Chunked ChEES-HMC with orbax checkpoints between chunks (the
    bench.py flagship pipeline's engine).  The per-sample Halton
    trajectory jitter is continued across chunks via the global sample
    offset, so an interrupted+resumed run draws the same jitter
    sequence as an uninterrupted one."""

    def __init__(self, potential_fn: Callable, config, ckpt_dir: str,
                 chunk_size: int = 200, inv_mass_diag=None):
        super().__init__(ckpt_dir, chunk_size)
        from ..inference import chees as CH

        self.potential_fn = potential_fn
        self.config = config
        self.inv_mass_diag = inv_mass_diag
        self._CH = CH
        self._sample_jit = jax.jit(
            lambda z, pot, grad, k, eps, T, im, hu: CH.sample_chees(
                self.potential_fn, z, pot, grad, k, self.chunk_size,
                eps, T, im, halton_u=hu, config=self.config))

    def _template(self, C, D):
        return dict(
            z=jnp.zeros((C, D)), pot=jnp.zeros((C,)),
            grad=jnp.zeros((C, D)), step_size=jnp.zeros(()),
            traj_length=jnp.zeros(()), inv_mass=jnp.zeros((D,)),
            key=jax.random.PRNGKey(0),
            chunks_done=jnp.zeros((), jnp.int32))

    def _warmup(self, init_positions, key):
        cfg = self.config._replace(num_samples=0)
        _, stats = self._CH.run_chees(
            self.potential_fn, init_positions, key, cfg,
            inv_mass_diag=self.inv_mass_diag)
        return dict(z=stats["final_position"],
                    pot=stats["final_pot"],
                    grad=stats["final_grad"],
                    step_size=stats["step_size"],
                    traj_length=stats["trajectory_length"],
                    inv_mass=stats["inv_mass_diag"])

    def _sample_chunk(self, state, key, start):
        # Halton continuation: chunk i uses points [W+start, W+start+n)
        # of the run-global sequence, exactly what an uninterrupted
        # run_chees would have used for these samples.
        W = self.config.num_warmup
        hu = jnp.asarray(self._CH._halton(
            W + start + self.chunk_size)[W + start:],
            state["z"].dtype)
        samples, (z, pot, grad), _ = self._sample_jit(
            state["z"], state["pot"], state["grad"], key,
            state["step_size"], state["traj_length"],
            state["inv_mass"], hu)
        return samples, dict(state, z=z, pot=pot, grad=grad)


class ResumableGHMC(_ResumableSampler):
    """Chunked generalized HMC with orbax checkpoints between chunks.

    GHMC adapts CONTINUOUSLY (fold-wise MEADS scheme, inference/ghmc),
    so the checkpoint persists the adaptation state (per-fold streaming
    variances + power-iteration vectors/eigenvalues) alongside the
    phase-space state — a resumed run continues the same adaptation
    trajectory an uninterrupted run would have followed.
    """

    def __init__(self, potential_fn: Callable, config, ckpt_dir: str,
                 chunk_size: int = 200, inv_mass_diag=None):
        super().__init__(ckpt_dir, chunk_size)
        from ..inference import ghmc as G

        self.potential_fn = potential_fn
        self.config = config
        self.inv_mass_diag = inv_mass_diag
        self._G = G
        self._sample_jit = jax.jit(
            lambda st, ad, k, mult: G.sample_ghmc(
                self.potential_fn, st, ad, k, self.chunk_size,
                self.config, step_mult=mult))

    def _template(self, C, D):
        F = self.config.num_folds
        return dict(
            z=jnp.zeros((C, D)), r=jnp.zeros((C, D)),
            pot=jnp.zeros((C,)), grad=jnp.zeros((C, D)),
            v_g=jnp.zeros((F, D)), v_z=jnp.zeros((F, D)),
            lam_g=jnp.zeros((F,)), lam_z=jnp.zeros((F,)),
            var=jnp.zeros((F, D)), mult=jnp.ones((C,)),
            key=jax.random.PRNGKey(0),
            chunks_done=jnp.zeros((), jnp.int32))

    def _warmup(self, init_positions, key):
        cfg = self.config._replace(num_samples=0)
        _, stats = self._G.run_ghmc(
            self.potential_fn, init_positions, key, cfg,
            inv_mass_diag=self.inv_mass_diag)
        st, ad = stats["final_state"], stats["final_adapt"]
        return dict(z=st.z, r=st.r, pot=st.pot, grad=st.grad,
                    v_g=ad.v_g, v_z=ad.v_z, lam_g=ad.lam_g,
                    lam_z=ad.lam_z, var=ad.var,
                    mult=stats["step_mult"])

    def _sample_chunk(self, state, key, start):
        from ..inference.ghmc import GHMCState, _FoldAdapt

        st = GHMCState(state["z"], state["r"], state["pot"],
                       state["grad"])
        ad = _FoldAdapt(state["v_g"], state["v_z"], state["lam_g"],
                        state["lam_z"], state["var"])
        samples, st, ad, _ = self._sample_jit(
            st, ad, key, state.get("mult", jnp.ones_like(state["pot"])))
        return samples, dict(state, z=st.z, r=st.r, pot=st.pot,
                             grad=st.grad, v_g=ad.v_g, v_z=ad.v_z,
                             lam_g=ad.lam_g, lam_z=ad.lam_z, var=ad.var)
