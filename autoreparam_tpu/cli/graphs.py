"""Figures & tables from results JSONs — reference `graphs.py` parity
(SURVEY.md §3.1 "Figures/tables", §4.5).

    python -m autoreparam_tpu.cli.graphs --results_dir=./results \
        --out_dir=./figures

Produces, from whatever runs exist in --results_dir:
- ess_comparison.png  — grouped bars of ESS/grad (min over dims) per
  model × method (the paper's headline comparison figure).
- lambda_<model>.png  — per-variable λ heatmap for each cVIP/dVIP run
  (the paper's λ visualisation).
- results_table.tex   — LaTeX table of ESS/grad min/mean, R-hat, wall
  time per run.

Pure host-side post-processing; no model execution.
"""

from __future__ import annotations

import os
from collections import defaultdict

from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("results_dir", "./results", "where run JSONs live")
flags.DEFINE_string("out_dir", "./figures", "output directory")


def make_figures(results, out_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    written = []

    mcmc = [r for r in results if "ess_per_grad_min" in r]
    # dedupe: newest run wins per (model, method, inference, seed) —
    # results dirs may hold several configs of the same cell (hashed
    # filenames)
    newest = {}
    for r in mcmc:
        k = (r["model"], r["method"], r.get("inference", "hmc"),
             r.get("seed", 0))
        if k not in newest or (r.get("timestamp", 0)
                               > newest[k].get("timestamp", 0)):
            newest[k] = r
    mcmc = list(newest.values())
    if mcmc:
        # the bar chart reports the cross-seed MEDIAN per cell — the
        # same aggregation as make_zoo_table.py, so the figure and
        # ZOO_FULL.md can't disagree (single-seed min-ESS/grad has
        # 2-3x noise)
        by_cell = defaultdict(list)
        for r in mcmc:
            by_cell[(r["model"], r["method"])].append(
                r["ess_per_grad_min"])
        by_model = defaultdict(dict)
        for (mod, meth), vals in by_cell.items():
            by_model[mod][meth] = float(np.median(vals))
        models = sorted(by_model)
        methods = ["cp", "ncp", "cvip", "dvip", "interleaved"]
        width = 0.15
        fig, ax = plt.subplots(figsize=(1.8 * len(models) + 2, 4))
        x = np.arange(len(models))
        for j, m in enumerate(methods):
            vals = [by_model[mod].get(m, 0.0) for mod in models]
            ax.bar(x + (j - 2) * width, vals, width, label=m)
        ax.set_xticks(x)
        ax.set_xticklabels(models, rotation=20, ha="right")
        ax.set_ylabel("ESS per 1000 gradients (min over dims)")
        ax.set_yscale("log")
        ax.legend()
        fig.tight_layout()
        p = os.path.join(out_dir, "ess_comparison.png")
        fig.savefig(p, dpi=150)
        plt.close(fig)
        written.append(p)

    # λ heatmaps / LaTeX table: one row per (model, method) — newest run
    newest_cell = {}
    for r in mcmc:
        k = (r["model"], r["method"])
        if k not in newest_cell or (r.get("timestamp", 0)
                                    > newest_cell[k].get("timestamp", 0)):
            newest_cell[k] = r
    mcmc = list(newest_cell.values())

    for r in mcmc:
        lam = r.get("lambda")
        if not lam:
            continue
        rows = []
        labels = []
        for site, vals in lam.items():
            v = np.atleast_1d(np.asarray(vals, dtype=float)).ravel()
            rows.append(v)
            labels.append(f"{site} ({v.size})")
        width = max(len(v) for v in rows)
        mat = np.full((len(rows), width), np.nan)
        for i, v in enumerate(rows):
            mat[i, :len(v)] = v
        fig, ax = plt.subplots(
            figsize=(min(12, 2 + width * 0.12), 1 + 0.4 * len(rows)))
        im = ax.imshow(mat, vmin=0, vmax=1, cmap="RdBu_r",
                       aspect="auto", interpolation="nearest")
        ax.set_yticks(range(len(labels)))
        ax.set_yticklabels(labels)
        ax.set_xlabel("element index")
        ax.set_title(f"learned λ — {r['model']} ({r['method']}); "
                     "0 = NCP, 1 = CP")
        fig.colorbar(im, ax=ax, shrink=0.8)
        fig.tight_layout()
        p = os.path.join(out_dir,
                         f"lambda_{r['model']}_{r['method']}.png")
        fig.savefig(p, dpi=150)
        plt.close(fig)
        written.append(p)

    # LaTeX table
    lines = [
        r"\begin{tabular}{llrrrr}",
        r"\hline",
        r"model & method & ESS/grad$_{\min}$ & ESS/grad$_{\mathrm{mean}}$"
        r" & $\hat R_{\max}$ & wall [s] \\",
        r"\hline",
    ]
    for r in sorted(mcmc, key=lambda r: (r["model"], r["method"])):
        lines.append(
            f"{r['model'].replace('_', ' ')} & {r['method']} & "
            f"{r['ess_per_grad_min']:.3f} & {r['ess_per_grad_mean']:.3f}"
            f" & {r['rhat_max']:.3f} & {r['wall_time_s']:.1f} \\\\")
    lines += [r"\hline", r"\end{tabular}", ""]
    p = os.path.join(out_dir, "results_table.tex")
    with open(p, "w") as f:
        f.write("\n".join(lines))
    written.append(p)
    return written


def main(argv):
    del argv
    from ..utils.results import load_results

    results = load_results(FLAGS.results_dir)
    if not results:
        logging.warning("no results in %s", FLAGS.results_dir)
        return
    written = make_figures(results, FLAGS.out_dir)
    for p in written:
        logging.info("wrote %s", p)


if __name__ == "__main__":
    app.run(main)
