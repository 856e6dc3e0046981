"""Mean-field VI with joint (q, λ) optimization — cVIP/dVIP.

Rebuild of the reference's VI runner (SURVEY.md §3.1 "VI runner", §4.2):
a mean-field Gaussian surrogate over the *unconstrained* latent space,
reparameterisation-gradient ELBO, Adam (optax), and — the core trick —
the per-variable parameterisation λ of every VIP site optimized jointly
with the variational parameters.

Structural shift from the reference: the TF1 version ran one
`session.run` per Adam step (SURVEY.md §4.2 "hot loop #2"); here the
whole optimization is a single `lax.scan` inside one jitted program.

λ is stored as a logit (sigmoid-constrained to [0,1], matching the
reference's sigmoid-constrained TF variable, SURVEY.md §3.1) and enters
the model through `make_vip_model`, so ∂ELBO/∂λ flows through both the
auxiliary prior N(λμ, σ^λ) and the deterministic reassembly.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.interpreters import (ModelInfo, get_model_info,
                                 make_potential_fn)
from ..reparam import make_vip_model
from ..reparam.handler import eligible_sites

__all__ = ["VIResult", "fit_vi", "fit_vi_auto", "fit_vip_vi",
           "discretize_lambda"]

_LOG_2PI_E = math.log(2.0 * math.pi) + 1.0


class VIResult(NamedTuple):
    loc: jnp.ndarray          # (D,) q means, unconstrained space
    scale: jnp.ndarray        # (D,) q stddevs (diagonal part)
    lam: Dict[str, jnp.ndarray]  # learned λ per VIP site (empty if none)
    elbo_trace: jnp.ndarray   # (num_steps,)
    info: ModelInfo           # latent layout of the (reparameterised) model
    factor: Optional[jnp.ndarray] = None  # (D, r) low-rank cov factor
                                          # (q_rank > 0): Σ = diag(σ²)+VVᵀ

    def marginal_scale(self):
        """Per-dimension posterior stddev of q (what HMC init spread and
        the q*² diagonal mass should use)."""
        if self.factor is None:
            return self.scale
        return jnp.sqrt(self.scale ** 2
                        + jnp.sum(self.factor ** 2, axis=-1))

    def sample(self, key, n: int):
        """n draws from the full q (covariance included when low-rank)."""
        D = self.loc.shape[-1]
        if self.factor is None:
            eps = jax.random.normal(key, (n, D))
            return self.loc + self.scale * eps
        k0, k1 = jax.random.split(key)
        eps0 = jax.random.normal(k0, (n, D))
        eps1 = jax.random.normal(k1, (n, self.factor.shape[-1]))
        return self.loc + self.scale * eps0 + eps1 @ self.factor.T

    def log_q(self, z):
        """log q(z) for (n, D) points (Woodbury/determinant-lemma form
        when low-rank) — used by the importance-sampling trust check."""
        D = self.loc.shape[-1]
        x = z - self.loc
        if self.factor is None:
            return jnp.sum(-0.5 * (x / self.scale) ** 2
                           - jnp.log(self.scale)
                           - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)
        V = self.factor
        r = V.shape[-1]
        d_inv = 1.0 / (self.scale ** 2)
        # K = I_r + Vᵀ D⁻¹ V;  Σ⁻¹ = D⁻¹ − D⁻¹ V K⁻¹ Vᵀ D⁻¹
        K = jnp.eye(r) + (V * d_inv[:, None]).T @ V
        L = jnp.linalg.cholesky(K)
        xd = x * d_inv[None, :]                       # (n, D)
        u = xd @ V                                    # (n, r)
        w = jax.scipy.linalg.cho_solve((L, True), u.T).T
        quad = jnp.sum(xd * x, axis=-1) - jnp.sum(u * w, axis=-1)
        logdet = (jnp.sum(jnp.log(self.scale ** 2))
                  + 2.0 * jnp.sum(jnp.log(jnp.diag(L))))
        return -0.5 * (quad + logdet + D * jnp.log(2.0 * jnp.pi))


def _gaussian_entropy(log_scale):
    return jnp.sum(log_scale) + 0.5 * log_scale.size * _LOG_2PI_E


#: Default λ-regularization weight (see fit_vi(lam_reg=...)): nats of
#: per-element ELBO advantage required to hold a site centered, as an
#: asymmetric quadratic tilt w·Σλ² resolving λ toward NCP.  Default
#: 0.0 — the tilt was MEASURED AND REJECTED as a default (round 5):
#: the hypothesis was that ELBO-flat λ (election88's small exchangeable
#: blocks) should break toward the safe NCP side, but (a) on election88
#: the per-element ELBO slopes are the same order as any useful w, so
#: w=0.25 dragged *well-determined* λ down too (a_age 0.73→0.43,
#: a_region 0.89→0.49), created new mid-λ funnels, and collapsed the
#: 5-seed cVIP median 295→74 with one seed at R-hat 1.41
#: (results/election_probe/lamreg.json); (b) german_credit_gammascale's
#: genuine CP preference is only ~0.1 nat/element, so w=0.5 pushed
#: λ(beta) 0.855→0.473 — across the 0.5 dVIP threshold into the
#: catastrophic NCP cell (7.7 vs 991.7 ess/grad).  The λ landscape is
#: better-calibrated than any global tilt; the knob remains for
#: experiments (`--lam_reg`).  The election88 weak-seed scatter is NOT
#: λ-driven anyway: seeds with near-identical λ* span 33.6–453.9
#: ess/grad, so the variance lives in the HMC phase (see
#: experiments/probe_election_lamreg.py).
LAM_REG_DEFAULT = 0.0


#: jitted-fit-program memo: WeakKeyDictionary[model] -> {static_key:
#: jitted callable}.  Keyed on the model OBJECT (weakly — dropping the
#: model frees its programs) plus identities of the data arrays and
#: every static config knob; a hit skips fit_vi's Python re-trace
#: (~1.3s host on the bench shapes), so repeat fits in a resident
#: process cost only device execution.  jax.clear_caches() still
#: clears the underlying executables (the memoized wrapper simply
#: recompiles on next use), so long sweeps keep their LLVM-memory
#: hygiene (CLAUDE.md).
_FIT_PROGRAM_CACHE = None


def _cached_fit_program(model, static_key, build):
    global _FIT_PROGRAM_CACHE
    if _FIT_PROGRAM_CACHE is None:
        import weakref
        _FIT_PROGRAM_CACHE = weakref.WeakKeyDictionary()
    try:
        per_model = _FIT_PROGRAM_CACHE.setdefault(model, {})
    except TypeError:  # unhashable / unweakrefable model object
        return build()
    fn = per_model.get(static_key)
    if fn is None:
        fn = build()
        per_model[static_key] = fn
    return fn


def _vi_problem(model, model_args, model_kwargs, vip_sites, lam_tie,
                init_loc, num_mc_samples, q_rank: int = 0,
                lam_reg: float = 0.0):
    """Shared setup for fit_vi / fit_vi_auto: the (possibly VIP-wrapped)
    model's latent layout, neutral init, and the MC negative-ELBO.

    The returned objective is `neg_elbo(params, key, reg_w)` where
    `reg_w` scales the λ-regularization tilt `Σ_elements λ²` for this
    step (callers anneal it 0 → lam_reg so the early search is pure
    ELBO and only the converged λ feels the tiebreak).

    `q_rank > 0` upgrades q from mean-field to low-rank-plus-diagonal
    N(loc, diag(σ²) + VVᵀ) with V ∈ R^{D×r} (beyond the reference's
    mean-field surrogate, SURVEY.md §3.1 "VI runner"): draws are
    loc + σ∘ε₀ + Vε₁ and the entropy adds the determinant-lemma term
    ½·logdet(I_r + Vᵀdiag(σ⁻²)V).  The pytree only gains the "factor"
    leaf when q_rank > 0, so rank-0 programs are bit-identical to
    before (compile-cache stability)."""
    if vip_sites is not None:
        shapes = eligible_sites(model, model_args, model_kwargs)
        missing = [s for s in vip_sites if s not in shapes]
        if missing:
            raise ValueError(f"sites not VIP-eligible: {missing}")
        if lam_tie == "site":
            lam_shapes = {s: () for s in vip_sites}
        elif lam_tie == "element":
            lam_shapes = {s: shapes[s] for s in vip_sites}
        else:
            raise ValueError(f"unknown lam_tie {lam_tie!r}")
        lam_template = {s: jnp.full(sh, 0.5) for s, sh in
                        lam_shapes.items()}
        wrapped = make_vip_model(model, lam_template)
    else:
        lam_shapes = {}
        wrapped = model

    info = get_model_info(wrapped, model_args, model_kwargs)
    D = info.dim

    params0 = {
        "loc": (jnp.zeros((D,)) if init_loc is None
                else jnp.asarray(init_loc)),
        "log_scale": jnp.full((D,), -2.0),
        # λ init 0.5 (logit 0), the reference's neutral start [M]
        "lam_logit": {s: jnp.zeros(sh) for s, sh in lam_shapes.items()},
    }
    if q_rank > 0:
        # small symmetry-breaking init: V = 0 is a stationary point of
        # the ELBO (E[∇logp·ε₁ᵀ] = 0 there), so start slightly off it
        params0["factor"] = 0.01 * jax.random.normal(
            jax.random.PRNGKey(7), (D, q_rank))

    def neg_elbo(params, key, reg_w=0.0):
        lam = {s: jax.nn.sigmoid(v)
               for s, v in params["lam_logit"].items()}
        mdl = make_vip_model(model, lam) if vip_sites is not None else model
        pot = make_potential_fn(mdl, info, model_args, model_kwargs)
        scale = jnp.exp(params["log_scale"])
        if q_rank > 0:
            k0, k1 = jax.random.split(key)
            eps0 = jax.random.normal(k0, (num_mc_samples, D))
            eps1 = jax.random.normal(k1, (num_mc_samples, q_rank))
            z = params["loc"] + scale * eps0 + eps1 @ params["factor"].T
            vd = params["factor"] * jnp.exp(-params["log_scale"])[:, None]
            entropy = (_gaussian_entropy(params["log_scale"])
                       + 0.5 * jnp.linalg.slogdet(
                           jnp.eye(q_rank) + vd.T @ vd)[1])
        else:
            eps = jax.random.normal(key, (num_mc_samples, D))
            z = params["loc"] + scale * eps
            entropy = _gaussian_entropy(params["log_scale"])
        e_logp = -jnp.mean(jax.vmap(pot)(z))
        # λ-regularization tilt (docstring above): flat-ELBO λ resolves
        # to NCP; a site stays centered only if the ELBO pays for it.
        reg = sum((jnp.sum(v ** 2) for v in lam.values()),
                  jnp.zeros(()))
        return -(e_logp + entropy) + reg_w * reg

    return info, params0, neg_elbo, lam_shapes


def _perturbed_init(params0, key, perturb, lam_shapes):
    """Restart init: perturb=0 keeps the canonical neutral start; >0
    scatters λ logits across [σ(−3), σ(3)] and jitters loc (the (q, λ)
    basins differ chiefly in which side of 0.5 each λ settles)."""
    kl, kc = jax.random.split(key)
    return dict(
        params0,
        loc=params0["loc"] + perturb * 0.3 * jax.random.normal(
            kc, params0["loc"].shape),
        lam_logit=jax.tree.map(
            lambda v, k: v + perturb * 3.0 * jax.random.normal(
                k, v.shape),
            params0["lam_logit"],
            dict(zip(params0["lam_logit"],
                     jax.random.split(kl, max(len(lam_shapes), 1))[
                         :len(lam_shapes)]))),
    )


def fit_vi(model: Callable,
           model_args: tuple = (),
           model_kwargs: Optional[dict] = None,
           *,
           vip_sites: Optional[Tuple[str, ...]] = None,
           num_steps: int = 3000,
           num_mc_samples: int = 8,
           learning_rate: float = 0.02,
           lr_schedule: str = "cosine",
           key=None,
           init_loc: Optional[jnp.ndarray] = None,
           num_restarts: int = 1,
           lam_tie: str = "element",
           q_rank: int = 0,
           lam_reg: Optional[float] = None) -> VIResult:
    """Fit mean-field q; if `vip_sites` is given, the model is rewritten
    into VIP form on those sites and λ is learned jointly (cVIP).

    `lam_reg` (None → LAM_REG_DEFAULT) is the λ-regularization weight:
    an asymmetric quadratic tilt `w·Σλ²` on the learned λ, annealed in
    over the first half of the budget, that resolves ELBO-flat λ toward
    NCP instead of leaving it wherever Adam's noise drifted (see
    LAM_REG_DEFAULT's calibration note).  Pass 0.0 for the untilted
    reference objective (SURVEY.md §4.2 verbatim).

    `vip_sites=None` fits plain ADVI on the model as passed (use a
    CP/NCP-rewritten model for the reference's `--inference=VI`
    comparisons, SURVEY.md §4.4).

    `num_restarts > 1` runs that many independent optimizations (vmapped
    over restart keys — one compiled program, the TPU-native way to
    restart) and keeps the one with the best final ELBO: the joint
    (q, λ) objective is multi-basin on models like german_credit (λ has
    CP-like and NCP-like basins per site), and a single Adam run can
    settle in the worse one.

    `lam_tie="site"` learns ONE λ per VIP site instead of elementwise
    (the paper's per-variable λ is the `"element"` default): for
    exchangeable vector sites (e.g. 25 iid local scales) tying removes
    the per-element λ noise floor — every element shares the evidence.
    """
    model_kwargs = model_kwargs or {}
    key = key if key is not None else jax.random.PRNGKey(0)
    if lam_reg is None:
        lam_reg = LAM_REG_DEFAULT

    info, params0, neg_elbo, lam_shapes = _vi_problem(
        model, model_args, model_kwargs, vip_sites, lam_tie, init_loc,
        num_mc_samples, q_rank, lam_reg)

    # λ-tilt annealing: 0 over the early search (pure ELBO picks the
    # basin), ramping to lam_reg by mid-budget so only the converged λ
    # feels the tiebreak.
    reg_ws = lam_reg * jnp.clip(
        jnp.arange(num_steps, dtype=jnp.float32)
        / max(0.5 * num_steps, 1.0), 0.0, 1.0)

    # Constant LR for 70% of the budget, then a cosine tail to ~0: the
    # tail makes the final (q*, λ*) a near-fixed point of the optimizer
    # instead of a sample from Adam's stationary noise ball — λ* and the
    # q* stddevs feed the HMC phase (init, diagonal mass), so end-of-run
    # noise there directly degrades the sampler.  The constant head
    # keeps short (CI/quick) budgets converging as fast as plain Adam.
    if lr_schedule == "cosine":
        head = int(0.7 * num_steps)
        lr = optax.join_schedules(
            [optax.constant_schedule(learning_rate),
             optax.cosine_decay_schedule(learning_rate,
                                         max(num_steps - head, 1),
                                         alpha=0.02)],
            [head])
    elif lr_schedule == "constant":
        lr = learning_rate
    else:
        raise ValueError(f"unknown lr_schedule {lr_schedule!r}")
    opt = optax.adam(lr)

    def _lam_sq(params):
        return sum((jnp.sum(jax.nn.sigmoid(v) ** 2)
                    for v in params["lam_logit"].values()),
                   jnp.zeros(()))

    def step(carry, xs):
        key, reg_w = xs
        params, opt_state = carry
        loss, grads = jax.value_and_grad(neg_elbo)(params, key, reg_w)
        # the traced ELBO excludes the tilt: restart selection and the
        # persisted elbo_trace stay comparable across lam_reg settings
        elbo = -(loss - reg_w * _lam_sq(params))
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), elbo

    def one_fit(key, perturb):
        # restarts must *start* in different basins to explore them
        # (same MC keys from the same init would mostly re-find one
        # basin) — see _perturbed_init
        k_init, k_run = jax.random.split(key)
        p0 = _perturbed_init(params0, k_init, perturb, lam_shapes)
        keys = jax.random.split(k_run, num_steps)
        (params, _), elbos = jax.lax.scan(step, (p0, opt.init(p0)),
                                          (keys, reg_ws))
        return params, elbos

    # jit the WHOLE fit (not just the inner scan): an eager lax.scan
    # compiles every process start and is invisible to the persistent
    # compile cache — measured 16.8s first-call vs 0.6s steady on the
    # TPU bench shapes — while the jitted fit deserializes from
    # .jax_cache/. Everything data-dependent (key, perturb) is a traced
    # argument; the HLO depends only on the model constants and sizes,
    # so it is identical across invocations (CLAUDE.md cache rule).
    # The jitted callable is additionally memoized per (model, static
    # config): repeat fits in a resident process then skip the ~1.3s
    # Python re-trace too and pay only device execution — the marginal
    # per-fit cost bench.py's steady amortized metric reports.
    cache_key = (tuple(id(a) for a in model_args),
                 tuple(sorted((k, id(v)) for k, v in model_kwargs.items())),
                 vip_sites, num_steps, num_mc_samples, learning_rate,
                 lr_schedule, id(init_loc) if init_loc is not None
                 else None, num_restarts, lam_tie, q_rank, float(lam_reg))
    if num_restarts <= 1:
        fit_fn = _cached_fit_program(model, ("single",) + cache_key,
                                     lambda: jax.jit(one_fit))
        params, elbos = fit_fn(key, jnp.float32(0.0))
    else:
        # vmapping the whole fit runs the restarts as one batched
        # program — restarts are data parallelism here
        fit_fn = _cached_fit_program(model, ("vmap",) + cache_key,
                                     lambda: jax.jit(jax.vmap(one_fit)))
        params_k, elbos_k = fit_fn(
            jax.random.split(key, num_restarts),
            jnp.arange(num_restarts, dtype=jnp.float32).clip(0.0, 1.0))
        score = jnp.mean(elbos_k[:, -100:], axis=-1)
        score = jnp.where(jnp.isfinite(score), score, -jnp.inf)
        best = jnp.argmax(score)
        params = jax.tree.map(lambda a: a[best], params_k)
        elbos = elbos_k[best]

    lam = {s: jax.nn.sigmoid(v) for s, v in params["lam_logit"].items()}
    return VIResult(loc=params["loc"],
                    scale=jnp.exp(params["log_scale"]),
                    lam=lam,
                    elbo_trace=elbos,
                    info=info,
                    factor=params.get("factor"))


def fit_vi_auto(model: Callable,
                model_args: tuple = (),
                model_kwargs: Optional[dict] = None,
                *,
                vip_sites: Optional[Tuple[str, ...]] = None,
                max_steps: int = 20000,
                chunk_steps: int = 500,
                tail_steps: Optional[int] = None,
                plateau_tol: float = 0.05,
                num_mc_samples: int = 8,
                learning_rate: float = 0.02,
                key=None,
                init_loc: Optional[jnp.ndarray] = None,
                num_restarts: int = 1,
                lam_tie: str = "element",
                q_rank: int = 0,
                lam_reg: Optional[float] = None) -> VIResult:
    """fit_vi with the step budget chosen by the ELBO instead of by
    hand: constant-LR chunks of `chunk_steps` run until the mean ELBO
    of a chunk's last 100 steps improves on the previous chunk's by
    less than `plateau_tol` nats (or `max_steps` is hit), then a
    cosine-decay tail of `tail_steps` anneals LR to ~0 so the returned
    (q*, λ*) is a near-fixed point rather than a draw from Adam's
    stationary noise ball (same rationale as fit_vi's schedule tail —
    q*/λ* feed the HMC phase's init and mass).

    The chunk runner takes params/opt state as traced args, so every
    chunk reuses ONE compiled program regardless of how many run (repo
    compile-cache convention).  With `num_restarts > 1` all restarts
    advance together (vmapped) and the plateau check uses the best
    restart's improvement; the final pick is the best tail ELBO.
    """
    model_kwargs = model_kwargs or {}
    key = key if key is not None else jax.random.PRNGKey(0)
    if tail_steps is None:
        tail_steps = chunk_steps
    if lam_reg is None:
        lam_reg = LAM_REG_DEFAULT

    info, params0, neg_elbo, lam_shapes = _vi_problem(
        model, model_args, model_kwargs, vip_sites, lam_tie, init_loc,
        num_mc_samples, q_rank, lam_reg)

    head_opt = optax.adam(learning_rate)
    tail_opt = optax.adam(
        optax.cosine_decay_schedule(learning_rate, tail_steps,
                                    alpha=0.02))

    def _lam_sq(params):
        return sum((jnp.sum(jax.nn.sigmoid(v) ** 2)
                    for v in params["lam_logit"].values()),
                   jnp.zeros(()))

    def _step(opt):
        def step(carry, xs):
            key, reg_w = xs
            params, opt_state = carry
            loss, grads = jax.value_and_grad(neg_elbo)(params, key,
                                                       reg_w)
            # traced ELBO excludes the tilt (fit_vi convention)
            elbo = -(loss - reg_w * _lam_sq(params))
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), elbo
        return step

    R = max(num_restarts, 1)

    @jax.jit
    def run_chunk(params, opt_state, keys, reg_ws):  # keys: (R, chunk)
        def one(p, s, ks):
            (p, s), elbos = jax.lax.scan(_step(head_opt), (p, s),
                                         (ks, reg_ws))
            return p, s, elbos
        return jax.vmap(one)(params, opt_state, keys)

    @jax.jit
    def run_tail(params, keys, reg_ws):            # fresh tail opt state
        def one(p, ks):
            (p, _), elbos = jax.lax.scan(_step(tail_opt),
                                         (p, tail_opt.init(p)),
                                         (ks, reg_ws))
            return p, elbos
        return jax.vmap(one)(params, keys)

    k_init, key = jax.random.split(key)
    perturbs = jnp.arange(R, dtype=jnp.float32).clip(0.0, 1.0)
    params = jax.vmap(lambda k, p: _perturbed_init(
        params0, k, p, lam_shapes))(jax.random.split(k_init, R), perturbs)
    opt_state = jax.vmap(head_opt.init)(params)

    def _score(elbos):  # (R, n) -> (R,) mean of last <=100, NaN -> -inf
        s = jnp.mean(elbos[:, -min(100, elbos.shape[1]):], axis=-1)
        return jnp.where(jnp.isfinite(s), s, -jnp.inf)

    traces = []
    prev_best = -jnp.inf
    steps_done = 0
    # tilt annealing (fit_vi convention): ramp 0 → lam_reg over the
    # first two chunks, constant after
    ramp = max(2 * chunk_steps, 1)
    while steps_done < max(max_steps - tail_steps, chunk_steps):
        k_chunk, key = jax.random.split(key)
        keys = jax.random.split(k_chunk, (R, chunk_steps))
        reg_ws = lam_reg * jnp.clip(
            (steps_done + jnp.arange(chunk_steps, dtype=jnp.float32))
            / ramp, 0.0, 1.0)
        params, opt_state, elbos = run_chunk(params, opt_state, keys,
                                             reg_ws)
        traces.append(elbos)
        steps_done += chunk_steps
        best = float(jnp.max(_score(elbos)))
        if best - float(prev_best) < plateau_tol and steps_done >= \
                2 * chunk_steps:
            break
        prev_best = best

    k_tail, key = jax.random.split(key)
    tkeys = jax.random.split(k_tail, (R, tail_steps))
    params, tail_elbos = run_tail(
        params, tkeys, jnp.full((tail_steps,), lam_reg, jnp.float32))
    traces.append(tail_elbos)

    best = jnp.argmax(_score(tail_elbos))
    p_best = jax.tree.map(lambda a: a[best], params)
    elbo_trace = jnp.concatenate([t[best] for t in traces])

    lam = {s: jax.nn.sigmoid(v) for s, v in p_best["lam_logit"].items()}
    return VIResult(loc=p_best["loc"],
                    scale=jnp.exp(p_best["log_scale"]),
                    lam=lam,
                    elbo_trace=elbo_trace,
                    info=info,
                    factor=p_best.get("factor"))


def fit_vip_vi(model: Callable, model_args: tuple = (),
               model_kwargs: Optional[dict] = None, **kw) -> VIResult:
    """cVIP: VIP-rewrite *all* eligible sites and learn their λ."""
    sites = tuple(eligible_sites(model, model_args, model_kwargs or {}))
    return fit_vi(model, model_args, model_kwargs, vip_sites=sites, **kw)


def discretize_lambda(lam: Dict[str, jnp.ndarray],
                      threshold: float = 0.5,
                      keep_band: float = 0.0) -> Dict[str, jnp.ndarray]:
    """dVIP: λ → {0,1} (reference thresholds at 0.5, SURVEY.md §3.1 [M]),
    so each variable is purely CP or NCP.

    `threshold` moves the cut: mid-λ elements are ones the ELBO was
    nearly indifferent about, but the *sampler* cost is asymmetric —
    rounding a genuinely-partial site to CP can recreate the funnel on
    its scale hyper-parameter (measured on election88: λ(a_edu)≈0.5,
    λ(a_age)≈0.72 → thresholded-to-CP dVIP collapses to 7.8 ess/grad
    while NCP holds ~400; log(sigma_edu) is the dying coordinate).  A
    threshold > 0.5 rounds toward the robust NCP side unless the ELBO
    was confidently centered.

    `keep_band > 0` keeps elements with |λ − 0.5| < keep_band at their
    continuous value (a cVIP/dVIP hybrid): only confident elements are
    snapped, the ambiguous ones keep the learned interpolation."""
    def one(v):
        hard = (v > threshold).astype(v.dtype)
        if keep_band > 0.0:
            return jnp.where(jnp.abs(v - 0.5) < keep_band, v, hard)
        return hard
    return {s: one(v) for s, v in lam.items()}
