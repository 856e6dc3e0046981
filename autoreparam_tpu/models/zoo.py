"""Model zoo: the reference's benchmark models as effect-handler programs.

Rebuild of `models.py` in the reference (SURVEY.md §3.1 "Model zoo"):
eight_schools, Neal's funnel, radon (multi-state), german_credit (both
variants), election88, electric company.  Each entry returns a
`ModelSpec`: the generative program, its arguments (data baked in),
and human-readable metadata.

Data: eight_schools uses the canonical Rubin (1981) numbers; the funnel
is analytic.  The larger datasets (radon, german_credit, election88,
electric) are generated offline stand-ins with the real datasets' shapes
and generative structure (see models/data/generate.py) because this
environment has no network access and the reference mount is empty — the
statistical *geometry* (hierarchy, funnels, per-group effects) is what
the benchmarks exercise, and that is preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dists as d
from ..core.messenger import sample
from . import data as data_lib

__all__ = ["ModelSpec", "get_model", "MODEL_REGISTRY", "register"]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    model: Callable
    args: tuple
    kwargs: dict
    description: str
    # names of observed-data sites, for reference
    observed: Tuple[str, ...] = ()


MODEL_REGISTRY: Dict[str, Callable[..., ModelSpec]] = {}

# How per-group effect lookups (`a[county_idx]`-style) are lowered.
# "matmul": contract against a constant one-hot matrix.  Under an
#   8192-chain vmap, `table[idx]` lowers to a batched gather whose
#   transpose (the gradient, evaluated 2L times per HMC transition) is a
#   serial scatter-add on the VPU; the one-hot contraction puts the same
#   data movement on the MXU and its gradient is just another matmul.
#   Exactly one unit entry per row + HIGHEST precision keeps it
#   bit-exact vs the gather (tests/test_models.py).
# "gather": plain indexing (the A/B control; experiments/probe_gather_matmul.py).
# "auto": per-call-site choice on idx.size (threshold below).
# Default "matmul": measured on the real TPU at 8192 chains with a
#   1000-iter scan (results/probe_gather_matmul.json, 2026-08-19),
#   matmul wins on EVERY measured call site: 1.17x on radon (one
#   124-wide take), 2.92x on election88 (51 + 4x2135), 1.19x on
#   electric (one 192-wide take).  An earlier 200-iter probe that
#   appeared to show gather winning on radon was dispatch-overhead
#   dominated (per-eval 381us vs 107us at 1000 iters) — its <10%
#   deltas were noise (identical-HLO control pairs differ by ~10%
#   run-to-run at this wall time).  No measured site wants gather,
#   so the per-site threshold heuristic is retired from the default
#   path; "auto"/"gather" remain as A/B knobs.
GATHER_IMPL = "matmul"
_AUTO_MATMUL_MIN_ROWS = 128
# Fold multi-take likelihoods into one constant design matmul where a
# model supports it (election88; see _election88_effects.logits_for).
# Default False: measured on the real TPU at 8192 chains x 1000 grad
# evals (results/probe_fused_design.json) the single contraction is
# 0.97x of the separate per-site matmuls — XLA already fuses the four
# take() outputs' adds, so the rewrite saves no traffic and costs a
# wider (cells x 77) contraction.  Both are ~3x the gather path.  Kept
# as tested infrastructure (tests/test_models.py) for models where
# XLA's fusion breaks down.
FUSED_DESIGN = False


def take(table, idx, n):
    """Gather rows of a per-group effect vector, TPU-style (see
    GATHER_IMPL).  `table` is (n,) inside the model ((chains, n) under
    vmap); `idx` is a constant int array of row ids; returns
    `table[idx]` elementwise-exactly."""
    # idx is constant data, so validate at trace time: out-of-range rows
    # would CLAMP on the gather path (JAX default) but yield 0 on the
    # one-hot matmul path — a silent divergence between lowerings.
    # (Skipped for traced idx — e.g. election88's age*n_edu+edu derived
    # inside the jit trace — where concretization is impossible; all
    # such call sites derive from validated constant inputs.)
    if not isinstance(idx, jax.core.Tracer):
        idx_np = np.asarray(idx)
        if idx_np.size and (idx_np.min() < 0 or idx_np.max() >= n):
            raise ValueError(
                f"take(): index out of range [0, {n}) — min "
                f"{idx_np.min()}, max {idx_np.max()}")
    impl = GATHER_IMPL
    if impl == "auto":
        impl = "matmul" if int(idx.size) >= _AUTO_MATMUL_MIN_ROWS else "gather"
    if impl == "gather":
        return table[idx]
    onehot = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
    return jnp.matmul(onehot.astype(table.dtype), table,
                      precision=jax.lax.Precision.HIGHEST)


def register(name):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


def get_model(name: str, dataset: Optional[str] = None) -> ModelSpec:
    """Reference-parity entry point (`models.get_model`-style dispatcher,
    SURVEY.md §3.1 [M])."""
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](dataset) if dataset is not None else (
        MODEL_REGISTRY[name]())


# ---------------------------------------------------------------------------
# eight_schools (Rubin 1981; BASELINE config #1)
# ---------------------------------------------------------------------------

EIGHT_SCHOOLS_Y = np.array([28., 8., -3., 7., -1., 1., 18., 12.],
                           dtype=np.float32)
EIGHT_SCHOOLS_SIGMA = np.array([15., 10., 16., 11., 9., 11., 10., 18.],
                               dtype=np.float32)


def eight_schools_model(y, sigma):
    mu = sample("mu", d.Normal(0.0, 5.0))
    log_tau = sample("log_tau", d.Normal(0.0, 5.0))
    theta = sample("theta", d.Normal(mu, jnp.exp(log_tau)),
                   sample_shape=(8,))
    sample("y", d.Normal(theta, sigma), obs=y)


@register("eight_schools")
def _eight_schools(dataset=None) -> ModelSpec:
    return ModelSpec(
        name="eight_schools",
        model=eight_schools_model,
        args=(jnp.asarray(EIGHT_SCHOOLS_Y), jnp.asarray(EIGHT_SCHOOLS_SIGMA)),
        kwargs={},
        description="Rubin (1981) eight schools; centered hierarchy with "
                    "log-scale tau prior (the reference's parameterisation "
                    "family: mu, log_tau ~ N(0,5)).",
        observed=("y",),
    )


# ---------------------------------------------------------------------------
# Neal's funnel (didactic example; BASELINE config #2)
# ---------------------------------------------------------------------------

def neals_funnel_model(dim: int = 9):
    v = sample("v", d.Normal(0.0, 3.0))
    sample("x", d.Normal(0.0, jnp.exp(v / 2.0)), sample_shape=(dim,))


@register("neals_funnel")
def _neals_funnel(dataset=None) -> ModelSpec:
    dim = int(dataset) if dataset else 9
    return ModelSpec(
        name="neals_funnel",
        model=neals_funnel_model,
        args=(dim,),
        kwargs={},
        description=f"Neal (2003) funnel, {dim}+1 dims; analytic: "
                    "v~N(0,3), x_i|v~N(0, e^{v/2}). No data.",
        observed=(),
    )


# ---------------------------------------------------------------------------
# radon — hierarchical linear model with county effects
# (Gelman & Hill ch. 12; BASELINE config #3 uses the Minnesota subset)
# ---------------------------------------------------------------------------

def radon_model(county_idx, floor_x, log_uranium, y, n_counties):
    """Varying-intercept + varying-slope radon model, the reference's
    "radon" family (SURVEY.md §3.1): county intercepts shrink toward a
    state-level regression on soil uranium.  Respondent-level variant
    (`get_model("radon", "MN:raw")`)."""
    mua = sample("mua", d.Normal(0.0, 1.0))
    b_uranium = sample("b", d.Normal(0.0, 1.0))
    sigma_a = sample("sigma_a", d.HalfCauchy(1.0))
    a = sample("a", d.Normal(mua + b_uranium * log_uranium, sigma_a))
    b_floor = sample("b_floor", d.Normal(0.0, 1.0))
    sigma_y = sample("sigma_y", d.HalfCauchy(1.0))
    mu_y = take(a, county_idx, n_counties) + b_floor * floor_x
    sample("y", d.Normal(mu_y, sigma_y), obs=y)


def radon_model_binned(cell_county, cell_floor, cell_n, cell_ybar,
                       cell_ss, log_uranium, n_counties):
    """Same posterior through exact Gaussian sufficient statistics per
    (county × floor) cell: the common-σ_y normal likelihood over ~919
    homes collapses to ≤2·n_counties cells (n, ȳ, Σ(y−ȳ)²), making the
    per-chain gradient cell-bound instead of household-bound — the
    default radon variant on TPU (equivalence-tested vs the raw model)."""
    mua = sample("mua", d.Normal(0.0, 1.0))
    b_uranium = sample("b", d.Normal(0.0, 1.0))
    sigma_a = sample("sigma_a", d.HalfCauchy(1.0))
    a = sample("a", d.Normal(mua + b_uranium * log_uranium, sigma_a))
    b_floor = sample("b_floor", d.Normal(0.0, 1.0))
    sigma_y = sample("sigma_y", d.HalfCauchy(1.0))
    mu_cell = take(a, cell_county, n_counties) + b_floor * cell_floor
    sample("y", d.NormalSufficientStats(mu_cell, sigma_y, cell_n,
                                        cell_ss), obs=cell_ybar)


def _radon_cells(ds):
    import numpy as np

    floor_i = ds["floor"].astype(np.int64)
    key = ds["county_idx"].astype(np.int64) * 2 + floor_i
    n_cells = int(ds["n_counties"]) * 2
    y = ds["log_radon"].astype(np.float64)
    n = np.bincount(key, minlength=n_cells)
    s1 = np.bincount(key, weights=y, minlength=n_cells)
    s2 = np.bincount(key, weights=y * y, minlength=n_cells)
    nz = n > 0
    ids = np.nonzero(nz)[0]
    ybar = s1[nz] / n[nz]
    ss = s2[nz] - n[nz] * ybar ** 2
    return {
        "cell_county": (ids // 2).astype(np.int32),
        "cell_floor": (ids % 2).astype(np.float32),
        "cell_n": n[nz].astype(np.float32),
        "cell_ybar": ybar.astype(np.float32),
        "cell_ss": np.maximum(ss, 0.0).astype(np.float32),
    }


@register("radon")
def _radon(dataset="MN") -> ModelSpec:
    raw = dataset is not None and dataset.endswith(":raw")
    state = dataset.split(":")[0] if dataset else "MN"
    ds = data_lib.load_radon(state)
    if raw:
        return ModelSpec(
            name=f"radon_{state}_raw",
            model=radon_model,
            args=(jnp.asarray(ds["county_idx"]), jnp.asarray(ds["floor"]),
                  jnp.asarray(ds["log_uranium"]),
                  jnp.asarray(ds["log_radon"]),
                  int(ds["n_counties"])),
            kwargs={},
            description=f"Hierarchical radon model, state={state}, "
                        f"respondent-level: {len(ds['log_radon'])} homes, "
                        f"{ds['n_counties']} counties.",
            observed=("y",),
        )
    cells = _radon_cells(ds)
    return ModelSpec(
        name=f"radon_{state}",
        model=radon_model_binned,
        args=(jnp.asarray(cells["cell_county"]),
              jnp.asarray(cells["cell_floor"]),
              jnp.asarray(cells["cell_n"]),
              jnp.asarray(cells["cell_ybar"]),
              jnp.asarray(cells["cell_ss"]),
              jnp.asarray(ds["log_uranium"]),
              int(ds["n_counties"])),
        kwargs={},
        description=f"Hierarchical radon model, state={state}: "
                    f"{len(ds['log_radon'])} homes collapsed to "
                    f"{len(cells['cell_n'])} county×floor cells (exact "
                    f"sufficient statistics), {ds['n_counties']} counties.",
        observed=("y",),
    )


# ---------------------------------------------------------------------------
# german_credit — two variants (BASELINE config #4 uses lognormalcentered)
# ---------------------------------------------------------------------------

def german_credit_lognormalcentered_model(x, y):
    """Sparse logistic regression with per-feature LogNormal scales —
    the reference's `german_credit_lognormalcentered` [H]
    (SURVEY.md §1): hierarchical shrinkage where the *centered* LogNormal
    scale parameterisation is the pathology NCP/iHMC fixes."""
    n_features = x.shape[1]
    tau = sample("overall_scale", d.LogNormal(0.0, 10.0))
    lam = sample("local_scales", d.LogNormal(0.0, 10.0),
                 sample_shape=(n_features,))
    beta = sample("beta", d.Normal(0.0, 1.0), sample_shape=(n_features,))
    logits = x @ (beta * lam * tau)
    sample("y", d.Bernoulli(logits), obs=y)


def german_credit_gammascale_model(x, y):
    """Variant with Gamma-distributed precisions (the reference's
    `german_credit_gammascale` [M]): the precisions scale beta's PRIOR
    (beta_i ~ N(0, 1/sqrt(lam_i*tau))), the centered form whose
    beta↔precision funnel is exactly what NCP/VIP reparameterise.
    (An algebraically identical variant that moves the scaling into
    the likelihood — beta ~ N(0,1), logits = x@(beta/sqrt(lam*tau)) —
    has the same joint density but makes VIP a no-op on beta, which
    defeats the model's purpose in the zoo.)"""
    tau = sample("overall_prec", d.Gamma(0.5, 0.5))
    lam = sample("local_prec", d.Gamma(0.5, 0.5),
                 sample_shape=(x.shape[1],))
    beta = sample("beta", d.Normal(0.0, 1.0 / jnp.sqrt(lam * tau)))
    sample("y", d.Bernoulli(x @ beta), obs=y)


@register("german_credit_lognormalcentered")
def _gc_ln(dataset=None) -> ModelSpec:
    ds = data_lib.load_german_credit()
    return ModelSpec(
        name="german_credit_lognormalcentered",
        model=german_credit_lognormalcentered_model,
        args=(jnp.asarray(ds["x"]), jnp.asarray(ds["y"])),
        kwargs={},
        description="Sparse logistic regression, 1000×24 standardized "
                    "features, centered LogNormal local/global scales.",
        observed=("y",),
    )


@register("german_credit_gammascale")
def _gc_gs(dataset=None) -> ModelSpec:
    ds = data_lib.load_german_credit()
    return ModelSpec(
        name="german_credit_gammascale",
        model=german_credit_gammascale_model,
        args=(jnp.asarray(ds["x"]), jnp.asarray(ds["y"])),
        kwargs={},
        description="Sparse logistic regression with Gamma precisions.",
        observed=("y",),
    )


# ---------------------------------------------------------------------------
# election88 — hierarchical logistic regression (BASELINE config #5)
# ---------------------------------------------------------------------------

def _election88_effects(n_states, n_age, n_edu, n_region, region,
                        v_prev):
    """Shared latent structure of the full Gelman & Hill ch. 14 model:
    demographic fixed effects, hierarchical age/edu/age×edu effects, and
    state intercepts regressed on census region + previous Republican
    vote share (v.prev)."""
    mua = sample("mua", d.Normal(0.0, 1.0))
    b_female = sample("b_female", d.Normal(0.0, 1.0))
    b_black = sample("b_black", d.Normal(0.0, 1.0))
    b_v_prev = sample("b_v_prev", d.Normal(0.0, 2.5))
    sigma_age = sample("sigma_age", d.HalfCauchy(1.0))
    a_age = sample("a_age", d.Normal(0.0, sigma_age),
                   sample_shape=(n_age,))
    sigma_edu = sample("sigma_edu", d.HalfCauchy(1.0))
    a_edu = sample("a_edu", d.Normal(0.0, sigma_edu),
                   sample_shape=(n_edu,))
    sigma_ae = sample("sigma_age_edu", d.HalfCauchy(1.0))
    a_ae = sample("a_age_edu", d.Normal(0.0, sigma_ae),
                  sample_shape=(n_age * n_edu,))
    sigma_region = sample("sigma_region", d.HalfCauchy(1.0))
    a_region = sample("a_region", d.Normal(0.0, sigma_region),
                      sample_shape=(n_region,))
    sigma_a = sample("sigma_a", d.HalfCauchy(1.0))
    a = sample("a", d.Normal(mua + take(a_region, region, n_region)
                             + b_v_prev * v_prev, sigma_a))

    def logits_for(state, female, black, age, edu):
        # combined age×edu index in numpy so it stays a trace-time
        # constant (jnp arithmetic on constants inside a trace yields a
        # tracer, which would skip take()'s bounds validation)
        ae = np.asarray(age) * n_edu + np.asarray(edu)
        constant_rows = not any(isinstance(x, jax.core.Tracer)
                                for x in (state, female, black, age, edu))
        if GATHER_IMPL == "matmul" and FUSED_DESIGN and constant_rows:
            # Fused design matmul: fold the four one-hot lookups AND
            # the two fixed-effect columns into ONE constant design
            # matrix — 4 matmuls + 3 elementwise adds (and their
            # transposes in the gradient) become a single MXU
            # contraction.  Measured 0.97x of the separate path
            # (experiments/probe_fused_design.py), hence default-off;
            # see FUSED_DESIGN above.
            n_states = int(region.shape[0])
            cols = n_states + n_age + n_edu + n_age * n_edu + 2
            idx_np = [np.asarray(state), np.asarray(age), np.asarray(edu),
                      ae]
            sizes = [n_states, n_age, n_edu, n_age * n_edu]
            rows = idx_np[0].shape[0]
            design = np.zeros((rows, cols), np.float32)
            off = 0
            for ix, n in zip(idx_np, sizes):
                if ix.size and (ix.min() < 0 or ix.max() >= n):
                    raise ValueError(
                        f"election88 design: index out of range [0, {n})")
                design[np.arange(rows), off + ix] = 1.0
                off += n
            design[:, off] = np.asarray(female, np.float32)
            design[:, off + 1] = np.asarray(black, np.float32)
            params = jnp.concatenate(
                [a, a_age, a_edu, a_ae,
                 jnp.reshape(b_female, (1,)), jnp.reshape(b_black, (1,))])
            return jnp.matmul(jnp.asarray(design), params,
                              precision=jax.lax.Precision.HIGHEST)
        return (take(a, state, region.shape[0])
                + b_female * female + b_black * black
                + take(a_age, age, n_age) + take(a_edu, edu, n_edu)
                + take(a_ae, ae, n_age * n_edu))

    return logits_for


def election88_model(cell_state, cell_female, cell_black, cell_age,
                     cell_edu, cell_total, cell_yes, region, v_prev,
                     n_states, n_age, n_edu, n_region):
    """Gelman & Hill ch. 14 pre-election polling: P(Bush support) with
    sex/race fixed effects, hierarchical age, education and age×edu
    effects, and state random intercepts regressed on census region and
    previous Republican vote share (the reference's election88 model
    family; SURVEY.md §3.1 [M]).

    TPU-native formulation: the Bernoulli likelihood over ~11.5k
    respondents is collapsed to its sufficient statistics over the
    occupied (state × sex × race × age × edu) cells (Binomial per
    cell) — an *exact* reduction of the same posterior that cuts the
    per-chain gradient from 11566 rows to the occupied-cell count,
    which is what makes 8192-chain NUTS fit in HBM (BASELINE #5)."""
    logits_for = _election88_effects(n_states, n_age, n_edu, n_region,
                                     region, v_prev)
    logits = logits_for(cell_state, cell_female, cell_black, cell_age,
                        cell_edu)
    sample("y", d.Binomial(cell_total, logits), obs=cell_yes)


def election88_raw_model(state_idx, female, black, age, edu, y, region,
                         v_prev, n_states, n_age, n_edu, n_region):
    """Respondent-level variant (identical posterior; for parity checks
    and as the memory-stress benchmark)."""
    logits_for = _election88_effects(n_states, n_age, n_edu, n_region,
                                     region, v_prev)
    logits = logits_for(state_idx, female, black, age, edu)
    sample("y", d.Bernoulli(logits), obs=y)


def _election88_cells(ds):
    import numpy as np

    n_age, n_edu = int(ds["n_age"]), int(ds["n_edu"])
    strata = 4 * n_age * n_edu
    key = (ds["state_idx"].astype(np.int64) * strata
           + ds["female"].astype(np.int64) * (2 * n_age * n_edu)
           + ds["black"].astype(np.int64) * (n_age * n_edu)
           + ds["age"].astype(np.int64) * n_edu
           + ds["edu"].astype(np.int64))
    n_cells = int(ds["n_states"]) * strata
    total = np.bincount(key, minlength=n_cells)
    yes = np.bincount(key, weights=ds["y"], minlength=n_cells)
    nz = total > 0
    cell_ids = np.nonzero(nz)[0]
    return {
        "cell_state": (cell_ids // strata).astype(np.int32),
        "cell_female": ((cell_ids % strata)
                        // (2 * n_age * n_edu)).astype(np.float32),
        "cell_black": ((cell_ids % (2 * n_age * n_edu))
                       // (n_age * n_edu)).astype(np.float32),
        "cell_age": ((cell_ids % (n_age * n_edu))
                     // n_edu).astype(np.int32),
        "cell_edu": (cell_ids % n_edu).astype(np.int32),
        "cell_total": total[nz].astype(np.float32),
        "cell_yes": yes[nz].astype(np.float32),
    }


@register("election88")
def _election88(dataset=None) -> ModelSpec:
    ds = data_lib.load_election88()
    shared = (jnp.asarray(ds["region"]), jnp.asarray(ds["v_prev"]),
              int(ds["n_states"]), int(ds["n_age"]), int(ds["n_edu"]),
              int(ds["n_region"]))
    if dataset == "raw":
        return ModelSpec(
            name="election88_raw",
            model=election88_raw_model,
            args=(jnp.asarray(ds["state_idx"]), jnp.asarray(ds["female"]),
                  jnp.asarray(ds["black"]), jnp.asarray(ds["age"]),
                  jnp.asarray(ds["edu"]), jnp.asarray(ds["y"])) + shared,
            kwargs={},
            description=f"1988 CBS polls, respondent-level: "
                        f"{len(ds['y'])} rows, {ds['n_states']} states, "
                        "full G&H ch.14 covariates.",
            observed=("y",),
        )
    cells = _election88_cells(ds)
    return ModelSpec(
        name="election88",
        model=election88_model,
        args=(jnp.asarray(cells["cell_state"]),
              jnp.asarray(cells["cell_female"]),
              jnp.asarray(cells["cell_black"]),
              jnp.asarray(cells["cell_age"]),
              jnp.asarray(cells["cell_edu"]),
              jnp.asarray(cells["cell_total"]),
              jnp.asarray(cells["cell_yes"])) + shared,
        kwargs={},
        description=f"1988 CBS polls: {len(ds['y'])} respondents "
                    f"collapsed to {len(cells['cell_total'])} "
                    f"demographic cells (exact sufficient statistics), "
                    f"{ds['n_states']} states; full G&H ch.14 "
                    "hierarchical logistic regression (age/edu/age×edu "
                    "+ region + v.prev).",
        observed=("y",),
    )


# ---------------------------------------------------------------------------
# electric company — paired-schools educational TV experiment
# ---------------------------------------------------------------------------

def electric_model(grade_pair_idx, treatment, y, n_pairs):
    """Gelman & Hill electric-company experiment: pair-level intercepts,
    common treatment effect (reference inclusion is [M], SURVEY.md §1)."""
    mua = sample("mua", d.Normal(0.0, 1.0))
    b_treat = sample("b_treat", d.Normal(0.0, 1.0))
    sigma_a = sample("sigma_a", d.HalfCauchy(1.0))
    a = sample("a", d.Normal(100.0 * mua, sigma_a),
               sample_shape=(n_pairs,))
    sigma_y = sample("sigma_y", d.HalfCauchy(1.0))
    mu_y = take(a, grade_pair_idx, n_pairs) + b_treat * treatment
    sample("y", d.Normal(mu_y, sigma_y), obs=y)


@register("electric")
def _electric(dataset=None) -> ModelSpec:
    ds = data_lib.load_electric()
    return ModelSpec(
        name="electric",
        model=electric_model,
        args=(jnp.asarray(ds["pair_idx"]), jnp.asarray(ds["treatment"]),
              jnp.asarray(ds["y"]), int(ds["n_pairs"])),
        kwargs={},
        description="Electric-company paired experiment: pair intercepts "
                    "+ treatment effect.",
        observed=("y",),
    )
