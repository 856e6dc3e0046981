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


def result_filename(model: str, method: str, inference: str) -> str:
    return f"{model}__{method}__{inference}.json"


def save_result(results_dir: str, summary: dict,
                extra: Optional[dict] = None,
                samples=None) -> str:
    """Write one run's summary (+ optionally raw samples as .npz)."""
    os.makedirs(results_dir, exist_ok=True)
    payload = dict(summary)
    if extra:
        payload.update(extra)
    payload["timestamp"] = time.time()
    name = result_filename(payload.get("model", "model"),
                           payload.get("method", "method"),
                           payload.get("inference", "inference"))
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
