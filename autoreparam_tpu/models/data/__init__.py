"""Vendored datasets for the model zoo.

The reference shipped the real datasets in its `data/` directory
(SURVEY.md §3.1: german credit CSV, radon srrs2/cty, election CSVs).
This environment has no network access and the reference mount is empty,
so the larger datasets here are **deterministic synthetic stand-ins**
generated once (fixed seed) with the real datasets' shapes, index
structures, and generative pathologies — which is what the parity
benchmarks exercise (hierarchical shrinkage geometry, funnels, group
imbalance).  eight_schools uses the true Rubin (1981) numbers (in
zoo.py) and the funnel is analytic.

Arrays are cached as .npz next to this file so every run and every test
sees byte-identical data.

**Real-data drop-in path**: the synthetic stand-ins are swappable the
day the real files exist, with no code change.  `_cache` first looks
for `$AUTOREPARAM_TPU_DATA_DIR/<name>.npz`, then `<name>_real.npz`
next to this file; if found, it is loaded instead of the stand-in
(key schema validated against the synthetic builder's).  To migrate
the true datasets: convert each (srrs2.dat, german.data, the CBS
polls + G&H v.prev table, the electric-company table) to an .npz with
the keys documented on each loader below and drop it in — group sizes
and index ranges may differ freely; every model reads its shapes from
the arrays.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))

# Real radon srrs2 per-state sizes (households, counties) for the states
# the reference sweeps (SURVEY.md §3.1 [M]); values match the public
# srrs2.dat within memory accuracy — structure is what matters.
RADON_STATES = {
    "MN": (919, 85),
    "IN": (617, 70),
    "MO": (898, 97),
    "ND": (431, 41),
    "PA": (1185, 61),
    "MA": (445, 14),
    "AZ": (312, 15),
}


def _real_data_candidates(name: str):
    env_dir = os.environ.get("AUTOREPARAM_TPU_DATA_DIR")
    if env_dir:
        yield os.path.join(env_dir, name + ".npz")
    yield os.path.join(_DIR, name + "_real.npz")


def _cache(name: str, builder) -> Dict[str, np.ndarray]:
    # real-data drop-in (see module docstring): a real .npz with the
    # same key schema takes precedence over the synthetic stand-in
    for real_path in _real_data_candidates(name):
        if os.path.exists(real_path):
            with np.load(real_path) as f:
                real = {k: f[k] for k in f.files}
            want = set(builder().keys())
            got = set(real.keys())
            if got != want:
                raise ValueError(
                    f"real dataset {real_path} key schema mismatch: "
                    f"missing {sorted(want - got)}, "
                    f"unexpected {sorted(got - want)}")
            return real
    path = os.path.join(_DIR, name + ".npz")
    if os.path.exists(path):
        with np.load(path) as f:
            return {k: f[k] for k in f.files}
    out = builder()
    np.savez_compressed(path, **out)
    return out


def load_radon(state: str = "MN") -> Dict[str, np.ndarray]:
    if state not in RADON_STATES:
        raise KeyError(f"unknown radon state {state!r}; "
                       f"have {sorted(RADON_STATES)}")
    n_obs, n_counties = RADON_STATES[state]

    def build():
        rng = np.random.default_rng(20260816 + sum(map(ord, state)))
        # county sizes: heavily imbalanced like the real data (many
        # counties with <5 homes, a few with >100)
        raw = rng.dirichlet(np.full(n_counties, 0.3)) * n_obs
        sizes = np.maximum(1, np.round(raw)).astype(int)
        while sizes.sum() > n_obs:
            sizes[np.argmax(sizes)] -= 1
        while sizes.sum() < n_obs:
            sizes[rng.integers(n_counties)] += 1
        county_idx = np.repeat(np.arange(n_counties), sizes)
        log_uranium = rng.normal(0.0, 0.35, n_counties)
        floor = (rng.random(n_obs) < 0.85).astype(np.float32)  # mostly
        # ground-truth hierarchical process (Gelman & Hill scale)
        a = 1.46 + 0.72 * log_uranium + rng.normal(0, 0.16, n_counties)
        y = (a[county_idx] - 0.67 * (1.0 - floor)
             + rng.normal(0, 0.76, n_obs))
        return {
            "county_idx": county_idx.astype(np.int32),
            "floor": (1.0 - floor).astype(np.float32),  # 1 = basement-less
            "log_uranium": log_uranium.astype(np.float32),
            "log_radon": y.astype(np.float32),
            "n_counties": np.asarray(n_counties, np.int32),
        }

    return _cache(f"radon_{state}", build)


def load_german_credit() -> Dict[str, np.ndarray]:
    """1000 loans × 24 standardized numeric features, binary outcome
    (UCI Statlog shape)."""

    def build():
        rng = np.random.default_rng(20260817)
        n, p = 1000, 24
        x = rng.normal(0.0, 1.0, (n, p))
        # sparse ground truth: a handful of strong features
        beta = np.zeros(p)
        idx = rng.choice(p, 6, replace=False)
        beta[idx] = rng.normal(0.0, 1.2, 6)
        logits = x @ beta - 0.8  # ~70/30 class imbalance like the real set
        y = (rng.random(n) < 1 / (1 + np.exp(-logits))).astype(np.float32)
        x = (x - x.mean(0)) / x.std(0)
        return {"x": x.astype(np.float32), "y": y}

    return _cache("german_credit", build)


def load_election88() -> Dict[str, np.ndarray]:
    """CBS 1988 pre-election polls shape: ~11k respondents, 51 states,
    with the full Gelman & Hill ch. 14 covariate set: sex, race, age
    (4 categories), education (4 categories), age×edu interaction,
    state region (5 census regions) and previous Republican vote share
    (v.prev) as state-level predictors."""

    def build():
        rng = np.random.default_rng(20260818)
        n, n_states, n_age, n_edu, n_region = 11566, 51, 4, 4, 5
        sizes = np.maximum(5, np.round(
            rng.dirichlet(np.full(n_states, 1.5)) * n).astype(int))
        while sizes.sum() > n:
            sizes[np.argmax(sizes)] -= 1
        while sizes.sum() < n:
            sizes[rng.integers(n_states)] += 1
        state_idx = np.repeat(np.arange(n_states), sizes)
        female = (rng.random(n) < 0.53).astype(np.float32)
        black = (rng.random(n) < 0.10).astype(np.float32)
        age = rng.integers(0, n_age, n).astype(np.int32)
        edu = rng.integers(0, n_edu, n).astype(np.int32)
        region = rng.integers(0, n_region, n_states).astype(np.int32)
        # previous Republican vote share, centered (G&H v.prev scale)
        v_prev = rng.normal(0.0, 0.07, n_states)
        # ground-truth process with region + v.prev structure
        a_region = rng.normal(0.0, 0.25, n_region)
        a_age = rng.normal(0.0, 0.12, n_age)
        a_edu = rng.normal(0.0, 0.15, n_edu)
        a_ae = rng.normal(0.0, 0.08, (n_age, n_edu))
        a = (0.15 + a_region[region] + 3.0 * v_prev
             + rng.normal(0, 0.25, n_states))
        logits = (a[state_idx] - 0.1 * female - 1.8 * black
                  + a_age[age] + a_edu[edu] + a_ae[age, edu])
        y = (rng.random(n) < 1 / (1 + np.exp(-logits))).astype(np.float32)
        return {"state_idx": state_idx.astype(np.int32),
                "female": female, "black": black,
                "age": age, "edu": edu, "y": y,
                "region": region, "v_prev": v_prev.astype(np.float32),
                "n_states": np.asarray(n_states, np.int32),
                "n_age": np.asarray(n_age, np.int32),
                "n_edu": np.asarray(n_edu, np.int32),
                "n_region": np.asarray(n_region, np.int32)}

    return _cache("election88", build)


def load_electric() -> Dict[str, np.ndarray]:
    """Electric-company experiment shape: 96 class pairs × 2 arms."""

    def build():
        rng = np.random.default_rng(20260819)
        n_pairs = 96
        pair_idx = np.repeat(np.arange(n_pairs), 2)
        treatment = np.tile(np.array([0.0, 1.0], np.float32), n_pairs)
        a = rng.normal(100.0, 12.0, n_pairs)
        y = a[pair_idx] + 5.0 * treatment + rng.normal(0, 8.0, 2 * n_pairs)
        return {"pair_idx": pair_idx.astype(np.int32),
                "treatment": treatment,
                "y": y.astype(np.float32),
                "n_pairs": np.asarray(n_pairs, np.int32)}

    return _cache("electric", build)
