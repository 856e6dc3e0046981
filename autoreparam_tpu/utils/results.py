"""Results persistence: JSON artifacts per run (reference parity).

The reference wrote per-run JSON/pickle files (ESS, ESS/grad, acceptance,
learned λ, variational params, timings) to --results_dir and had separate
scripts turn them into figures/tables (SURVEY.md §3.1 "Diagnostics &
persistence", §4.5).  Same artifact flow here, JSON-only (no pickles —
arrays inline as lists; large raw samples are optionally saved as .npz).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

__all__ = ["save_result", "load_results", "result_filename"]


def _to_jsonable(x):
    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if isinstance(x, np.ndarray):
        return x.tolist()
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    if hasattr(x, "tolist"):  # jax arrays
        return np.asarray(x).tolist()
    return x


#: summary keys that distinguish run configurations; hashed into the
#: filename so two runs of the same (model, method, inference) with
#: different sizes/seeds never silently overwrite each other
_CONFIG_KEYS = ("num_chains", "num_warmup", "num_samples",
                "num_leapfrog_steps", "num_optimization_steps", "seed",
                "num_vi_restarts", "vip_lam_tie", "dvip_refit",
                "learning_rate", "target_accept", "max_tree_depth",
                "vi_mass_min_is_ess", "use_vi_init", "use_vi_mass")


def result_filename(model: str, method: str, inference: str,
                    tag: Optional[str] = None) -> str:
    suffix = f"__{tag}" if tag else ""
    return f"{model}__{method}__{inference}{suffix}.json"


def config_tag(summary: dict) -> Optional[str]:
    """Short stable hash of the distinguishing config keys (None if the
    summary carries none of them)."""
    import hashlib

    items = [(k, summary[k]) for k in _CONFIG_KEYS if k in summary]
    if not items:
        return None
    return hashlib.sha1(repr(items).encode()).hexdigest()[:8]


def save_result(results_dir: str, summary: dict,
                extra: Optional[dict] = None,
                samples=None) -> str:
    """Write one run's summary (+ optionally raw samples as .npz).

    The filename includes a hash of the run configuration, so re-running
    the same config overwrites its own artifact (idempotent) while a
    different size/seed writes a new file.  Table/figure builders dedupe
    by newest timestamp per (model, method, inference).
    """
    os.makedirs(results_dir, exist_ok=True)
    payload = dict(summary)
    if extra:
        payload.update(extra)
    payload["timestamp"] = time.time()
    name = result_filename(payload.get("model", "model"),
                           payload.get("method", "method"),
                           payload.get("inference", "inference"),
                           tag=config_tag(payload))
    path = os.path.join(results_dir, name)
    with open(path, "w") as f:
        json.dump(_to_jsonable(payload), f, indent=1)
    if samples is not None:
        npz = path[:-5] + "_samples.npz"
        if isinstance(samples, dict):
            np.savez_compressed(
                npz, **{k: np.asarray(v) for k, v in samples.items()})
        else:
            np.savez_compressed(npz, samples=np.asarray(samples))
    return path


def load_results(results_dir: str):
    """Load every result JSON in a directory (for figures/tables)."""
    out = []
    if not os.path.isdir(results_dir):
        return out
    for fn in sorted(os.listdir(results_dir)):
        if fn.endswith(".json"):
            with open(os.path.join(results_dir, fn)) as f:
                out.append(json.load(f))
    return out
