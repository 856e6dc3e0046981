"""Experiment CLI — reference `main.py` parity (SURVEY.md §3.1 [H]).

    python -m autoreparam_tpu.cli.main \
        --model=radon --dataset=MN --method=cvip --inference=hmc \
        --num_chains=128 --num_samples=1000 --burnin=1000 \
        --num_leapfrog_steps=16 --num_optimization_steps=3000 \
        --results_dir=./results

Flag vocabulary mirrors the reference CLI (--model --dataset --method
--inference --num_samples --burnin --num_leapfrog_steps
--num_adaptation_steps --num_optimization_steps --results_dir), with the
TPU-native additions --num_chains and --shard (mesh over all local
devices).
"""

from __future__ import annotations

from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("model", "eight_schools", "model name (see models/)")
flags.DEFINE_string("dataset", None, "dataset variant (e.g. radon state)")
flags.DEFINE_enum("method", "cp",
                  ["cp", "ncp", "cvip", "dvip", "interleaved"],
                  "parameterisation method")
flags.DEFINE_enum("inference", "hmc",
                  ["hmc", "nuts", "chees", "ghmc", "vi"],
                  "inference engine")
flags.DEFINE_integer("num_chains", 128, "parallel chains")
flags.DEFINE_integer("num_samples", 1000, "posterior samples per chain")
flags.DEFINE_integer("burnin", 1000, "warmup steps (adaptation)")
flags.DEFINE_integer("num_adaptation_steps", None,
                     "alias for --burnin (reference flag name); wins "
                     "when both are set")
flags.DEFINE_integer("num_leapfrog_steps", 16, "leapfrog steps (HMC)")
flags.DEFINE_integer("max_tree_depth", 8, "max tree depth (NUTS)")
flags.DEFINE_integer("num_optimization_steps", 3000,
                     "VI Adam steps (-1: plateau-gated auto budget)")
flags.DEFINE_integer("num_mc_samples", 8, "VI ELBO MC samples")
flags.DEFINE_float("learning_rate", 0.02, "VI Adam learning rate")
flags.DEFINE_float("target_accept", 0.75, "dual-averaging target")
flags.DEFINE_integer("seed", 0, "PRNG seed")
flags.DEFINE_string("results_dir", "./results", "output directory")
flags.DEFINE_bool("save_samples", False, "also save raw samples (.npz)")
flags.DEFINE_bool("print_summary", False,
                  "print the per-variable posterior table (mean/MCSE/sd/"
                  "CI/bulk+tail ESS/rank-normalized R-hat)")
flags.DEFINE_bool("shard", False, "shard chains over all local devices")
flags.DEFINE_enum("share_adaptation", "auto",
                  ["auto", "all", "mass", "none"],
                  "cross-chain warmup pooling: auto = per-model default, "
                  "all = pooled step size + ensemble mass, mass = "
                  "ensemble mass only, none = per-chain (Stan-style)")
flags.DEFINE_float("vi_mass_min_is_ess", 0.002,
                   "minimum relative importance-sampling ESS of q* vs "
                   "the posterior for the q*-variance mass seed to be "
                   "trusted (cvip/dvip); below it warmup starts from "
                   "the identity mass")
flags.DEFINE_integer("vi_rank", 0,
                     "low-rank-plus-diagonal q: rank of the covariance "
                     "factor (0 = mean-field, the reference's choice)")
flags.DEFINE_integer("num_vi_restarts", 1,
                     "independent VI restarts (vmapped; best final "
                     "ELBO wins) — the joint (q, lambda) objective is "
                     "multi-basin on some models")
flags.DEFINE_enum("vip_lam_tie", "element", ["element", "site"],
                  "lambda granularity: per-element (paper default) or "
                  "one tied lambda per site")
flags.DEFINE_boolean("vip_pilot", None,
                     "pilot-selected parameterisation: race {lambda*, "
                     "ncp, cp, dvip-band} in short pilot HMC runs and "
                     "use the winner (one compiled program; pilot "
                     "grads are adaptation, excluded from ess/grad "
                     "like warmup).  Default: off — on warmup-luck-"
                     "dominated models a short pilot cannot predict "
                     "full-length behavior (measured on election88, "
                     "results/election_probe/lamreg.json); use where "
                     "candidate geometries differ structurally")
flags.DEFINE_float("lam_reg", None,
                   "lambda-regularization weight: asymmetric quadratic "
                   "tilt w*sum(lambda^2) annealed into the VI objective "
                   "so ELBO-flat lambda resolves toward NCP instead of "
                   "Adam's noise (default: vi.LAM_REG_DEFAULT; 0 = the "
                   "untilted reference objective)")
flags.DEFINE_bool("dvip_refit", True,
                  "re-fit q on the thresholded model before the dVIP "
                  "HMC phase (init/mass must describe the model "
                  "actually sampled)")
flags.DEFINE_float("dvip_threshold", 0.5,
                   "dVIP lambda cut (reference: 0.5); > 0.5 rounds "
                   "ambiguous sites toward the robust NCP side")
flags.DEFINE_float("dvip_keep_band", 0.3,
                   "keep lambda elements within this band of 0.5 at "
                   "their continuous value (cVIP/dVIP hybrid).  "
                   "Default 0.3: snapping ELBO-ambiguous lambda to CP "
                   "recreates the funnel on its scale hyper (measured "
                   "32x collapse on election88); 0 restores the "
                   "reference's pure 0.5-threshold rule")
flags.DEFINE_bool("tail_transport", False,
                  "Gaussian tail transport on heavy-tailed scale sites "
                  "(sigma ~ HalfCauchy becomes a standard-normal latent "
                  "pushed through the prior quantile) — fixes the "
                  "E-BFMI < 0.3 heavy-tail energy pathology that "
                  "CP/NCP/VIP cannot touch on constant-parameter priors")
flags.DEFINE_list("leapfrog_sweep", None,
                  "sweep --num_leapfrog_steps over these values "
                  "(reference main.py's sweep loop), e.g. 2,4,8,16")
flags.DEFINE_enum("chees_criterion", "chees_rate",
                  ["chees", "chees_rate", "snaper", "snaper_rate"],
                  "trajectory-length criterion for --inference=chees: "
                  "raw or cost-normalized ChEES / SNAPER (principal-"
                  "component ESJD)")
flags.DEFINE_enum("mass_structure", "diag", ["diag", "dense"],
                  "HMC metric: Stan-style diagonal (default) or a "
                  "dense (D, D) inverse mass estimated from the pooled "
                  "cross-chain ensemble during warmup — removes the "
                  "mixing cost of inter-block posterior correlations "
                  "a diagonal metric cannot see (HMC and NUTS engines)")
flags.DEFINE_integer("ghmc_thin", 1,
                     "keep every N-th GHMC sweep (1 gradient each; "
                     "ess/grad accounting stays exact) — bounds kept-"
                     "sample memory when gradient-matching GHMC to "
                     "L-leapfrog engines")


def main(argv):
    del argv
    # heavy imports after flag parsing (fast --help)
    from ..inference.pipeline import run_experiment
    from ..models import get_model
    from ..utils.results import save_result

    spec = get_model(FLAGS.model, FLAGS.dataset)
    logging.info("model=%s method=%s inference=%s chains=%d",
                 spec.name, FLAGS.method, FLAGS.inference,
                 FLAGS.num_chains)
    sweep = ([int(x) for x in FLAGS.leapfrog_sweep]
             if FLAGS.leapfrog_sweep else [FLAGS.num_leapfrog_steps])
    for num_leapfrog in sweep:
        _run_one(spec, num_leapfrog)


def _run_one(spec, num_leapfrog):
    from ..inference.pipeline import run_experiment
    from ..utils.results import save_result

    res = run_experiment(
        spec, method=FLAGS.method, inference=FLAGS.inference,
        num_chains=FLAGS.num_chains,
        num_warmup=(FLAGS.num_adaptation_steps
                    if FLAGS.num_adaptation_steps is not None
                    else FLAGS.burnin),
        num_samples=FLAGS.num_samples,
        num_leapfrog_steps=num_leapfrog,
        max_tree_depth=FLAGS.max_tree_depth,
        num_optimization_steps=FLAGS.num_optimization_steps,
        num_mc_samples=FLAGS.num_mc_samples,
        learning_rate=FLAGS.learning_rate,
        target_accept=FLAGS.target_accept,
        seed=FLAGS.seed, shard=FLAGS.shard,
        vi_mass_min_is_ess=FLAGS.vi_mass_min_is_ess,
        num_vi_restarts=FLAGS.num_vi_restarts,
        vi_rank=FLAGS.vi_rank,
        vip_lam_tie=FLAGS.vip_lam_tie,
        lam_reg=FLAGS.lam_reg,
        vip_pilot=FLAGS.vip_pilot,
        dvip_refit=FLAGS.dvip_refit,
        dvip_threshold=FLAGS.dvip_threshold,
        dvip_keep_band=FLAGS.dvip_keep_band,
        tail_transport=FLAGS.tail_transport,
        chees_criterion=FLAGS.chees_criterion,
        ghmc_thin=FLAGS.ghmc_thin,
        mass_structure=FLAGS.mass_structure,
        share_adaptation={"auto": None, "all": True, "mass": "mass",
                          "none": False}[FLAGS.share_adaptation])

    s = res.summary
    # (sweep runs no longer need a mangled method name: result files are
    # keyed by a config hash including num_leapfrog_steps)
    if FLAGS.inference == "vi":
        logging.info("ELBO = %.3f", s["elbo"])
    else:
        logging.info("ess_min=%.1f ess/grad(min)=%.3f rhat_max=%.3f "
                     "wall=%.1fs",
                     s["ess_min"], s["ess_per_grad_min"], s["rhat_max"],
                     s["wall_time_s"])
        if "lambda" in s:
            for k, v in s["lambda"].items():
                logging.info("lambda[%s] = %s", k, v)
        if FLAGS.print_summary:
            from autoreparam_tpu.inference import result_summary
            result_summary(res, to_print=True)
    path = save_result(FLAGS.results_dir, s,
                       samples=res.samples if FLAGS.save_samples else None)
    logging.info("wrote %s", path)


if __name__ == "__main__":
    app.run(main)
