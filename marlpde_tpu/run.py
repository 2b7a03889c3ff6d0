"""Config-driven CLI entry point reproducing the reference's run-* drivers.

Usage:
    python -m marlpde_tpu.run <workload> [--flag value ...]

Workloads (reference driver -> name): see envs/registry.py.  Flag names track
the reference argparse surface (run-vracer-burger.py:5-34) where sensible.

Examples:
    python -m marlpde_tpu.run burger --NDNS 512 --N 32 --NA 32 --NE 500000 \
        --episodelength 500 --ic turbulence --specreward
    python -m marlpde_tpu.run diffusion-simple --N 128 --numAgents 1
    python -m marlpde_tpu.run burger-marl --nagents 32 --test --run 3
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="marlpde_tpu.run")
    p.add_argument("workload", type=str, help="env preset name (see envs/registry.py)")
    # solver/env flags (run-vracer-burger.py:5-34)
    p.add_argument("--NDNS", type=int, default=512)
    p.add_argument("--N", type=int, default=None, help="coarse grid size")
    p.add_argument("--NA", "--numactions", dest="NA", type=int, default=None,
                   help="number of actions")
    p.add_argument("--NE", "--exp", "--numexp", dest="NE", type=float,
                   default=5e5, help="max experiences")
    p.add_argument("--width", type=int, default=None,
                   help="hidden width (default: the reference driver's)")
    p.add_argument("--iex", type=float, default=None,
                   help="Initial Exploration Noise (default: the reference "
                        "driver's, e.g. 0.1 burger / 3 diffusion-simple)")
    p.add_argument("--episodelength", type=int, default=500)
    p.add_argument("--noise", type=float, default=0.0)
    p.add_argument("--ic", type=str, default=None)
    p.add_argument("--L", type=float, default=2 * np.pi)
    p.add_argument("--dforce", action="store_true")
    p.add_argument("--ssmforce", action="store_true")
    p.add_argument("--specreward", action="store_true")
    p.add_argument("--forcing", action="store_true")
    p.add_argument("--nunoise", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--stepper", type=int, default=1)
    p.add_argument("--dt", type=float, default=None)
    p.add_argument("--T", "--tend", dest="T", type=float, default=None)
    p.add_argument("--nu", type=float, default=None)
    p.add_argument("--ssm", action="store_true")
    p.add_argument("--dsm", action="store_true")
    p.add_argument("--run", type=int, default=0, help="run tag / result folder suffix")
    p.add_argument("--version", type=int, default=0)
    p.add_argument("--ndns", type=int, default=1)
    p.add_argument("--nagents", "--numAgents", dest="nagents", type=int, default=None)
    p.add_argument("--test", action="store_true")
    p.add_argument("--ids", type=str, default=None,
                   help='with --test: comma list of DNS-pool sample ids to '
                        'evaluate (korali e["Solver"]["Testing"]["Sample '
                        'Ids"], run-vracer-burger.py:207); default = whole '
                        "pool")
    p.add_argument("--nus", type=str, default=None,
                   help="with --test: comma list of viscosities to sweep — "
                        "the DNS pool is rebuilt per value (run-vracer-"
                        'burger.py:203-209 Custom Settings "Viscosity")')
    p.add_argument("--best", action="store_true",
                   help="with --test: evaluate the best-test-return "
                        "checkpoint (<result>/best/) instead of the final one")
    p.add_argument("--sigma-max", type=float, default=None,
                   help="exploration-sigma ceiling (networks.VracerNet."
                        "sigma_max).  Default: HALF THE ACTION RANGE — a "
                        "clipped normal with sigma >= (ub-lb)/2 is already "
                        "~uniform-over-box plus bound masses, so the cap "
                        "removes no realizable behavior; it only removes the "
                        "sigma ratchet (REFER's forward-KL trust region is "
                        "log-cheap upward, quadratic downward, so sigma can "
                        "only ratchet up — measured on runs/flagship_905.log: "
                        "0.26 -> 8.5 over 100 generations, degrading "
                        "collection).  Pass inf for korali-unbounded")
    # learner flags
    p.add_argument("--beta0", type=float, default=None,
                   help="initial REFER beta (korali: 0.3); diagnostic knob")
    p.add_argument("--offtarget", type=float, default=None,
                   help="REFER off-policy target D (korali: 0.1); diagnostic")
    p.add_argument("--rscale", type=str, default=None,
                   choices=["replay", "cumulative"],
                   help="experience-mode reward-rescaling statistic: korali's "
                        "live-buffer second moment (default) or the cumulative "
                        "run history (stable late-run value targets; see "
                        "VracerConfig.reward_scale_source)")
    p.add_argument("--trust", type=str, default=None,
                   choices=["jeffreys", "forward"],
                   help="far-policy trust-region divergence (default: the "
                        "VracerConfig default, jeffreys)")
    p.add_argument("--muparam", type=str, default=None,
                   choices=["absolute", "sigma_relative"],
                   help="policy-mean parameterization: direct output "
                        "(korali-style) or in units of the exploration "
                        "stddev (natural-gradient coordinates; required "
                        "when iex << action range — see "
                        "networks.VracerNet.mu_param)")
    p.add_argument("--dimnorm", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="dimension-tempered importance weights "
                        "(rho^(1/sqrt(d)); exactly korali at d=1 — see "
                        "VracerConfig.cutoff_dim_norm).  Defaults ON for "
                        "ks/diffusion workloads (docs/REFER_SCALE.md); "
                        "--no-dimnorm restores korali-exact")
    p.add_argument("--learner", type=str, default="vracer",
                   choices=["vracer", "apg"],
                   help="apg = analytic policy gradient through the "
                        "differentiable rollout (gradient-aware RL; "
                        "use with burger-jax)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--gamma", type=float, default=None)
    p.add_argument("--mar", type=str, default="individual",
                   help="Multi Agent Relationship: individual|cooperation")
    p.add_argument("--mac", action="store_true",
                   help="Multi Agent Correlation: joint (product) importance "
                        "weight across agents (run-vracer-burger-marl.py:113)")
    p.add_argument("--minibatch", type=str, default="experience",
                   choices=["episode", "experience"],
                   help="minibatch sampler: korali's 256-uniform-experience "
                        "mode on the flat REFER replay (default) or whole "
                        "episodes (TPU-native alternative)")
    p.add_argument("--mbsize", type=int, default=256,
                   help='korali e["Solver"]["Mini Batch Size"] '
                        "(run-vracer-burger.py:132; experience mode only)")
    p.add_argument("--rstart", type=int, default=None,
                   help='Experience Replay Start Size (default: the burger '
                        'drivers\' 20000*episodelength/500; diffusion drivers '
                        'use 32768)')
    p.add_argument("--rmax", type=int, default=None,
                   help='Experience Replay Maximum Size (default: '
                        '100000*episodelength/500; diffusion drivers use 2^20)')
    p.add_argument("--expperu", type=float, default=None,
                   help="Experiences Between Policy Updates (default: the "
                        "reference driver's — 0.5 burger/ks, 1 stencil "
                        "workloads); replay reuse = 256/expperu")
    p.add_argument("--force", type=str, default="zero",
                   help="laplace source term f(x): zero|sin|cos|sincos|"
                        "fourier|gaussian (run-vracer-laplace.py:14)")
    p.add_argument("--pop", type=int, default=8,
                   help="CMA-ES population size (run-cmaes-burger.py:8)")
    p.add_argument("--numgen", type=int, default=50,
                   help="CMA-ES generations (run-cmaes-burger.py:7)")
    # trainer flags
    p.add_argument("--numenvs", type=int, default=16, help="episodes per generation")
    p.add_argument("--realexp", action="store_true",
                   help="korali-faithful experience accounting: count only "
                        "live (unmasked) env-steps toward --NE, the replay-"
                        "start gate, and updates/gen (matters for early-"
                        "terminating workloads like diffusion-simple); "
                        "forces the unfused trainer path")
    p.add_argument("--maxupd", type=int, default=10000,
                   help="cap on gradient updates per generation; the default "
                        "clears the korali economics (10 episodes x 500 "
                        "steps / 0.5 expperu = 10000) so the ledger, not the "
                        "cap, governs")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--diag", action="store_true",
                   help="per-generation decay-phase diagnostics into "
                        "history['diag'] (V(s0) vs return in scaled "
                        "units, policy drift, replay occupancy)")
    p.add_argument("--serialize-replay", action="store_true",
                   help="save the replay buffer with checkpoints "
                        "(korali Experience Replay Serialize)")
    p.add_argument("--testfreq", "--tf", dest="testfreq", type=int, default=0,
                   help="generations between deterministic evals "
                        '(e["Problem"]["Testing Frequency"]; 0 = off)')
    p.add_argument("--testepisodes", "--nt", dest="testepisodes", type=int,
                   default=8,
                   help='episodes per deterministic eval '
                        '(e["Problem"]["Policy Testing Episodes"])')
    p.add_argument("--mesh", action="store_true",
                   help="train data-parallel over ALL visible devices "
                        "(1-D env mesh, shard_map generation; parallel/mesh.py). "
                        "--numenvs is the GLOBAL episodes per generation")
    p.add_argument("--fused", action="store_true",
                   help="fuse each generation (collect+replay+updates) into "
                        "one XLA dispatch — fastest on TPU")
    p.add_argument("--fast", type=str, default="auto",
                   choices=["auto", "pallas", "off"],
                   help="rollout backend for qualifying Burgers configs "
                        "(registry.fast_burger_ok): whole-batch jnp (auto), "
                        "fused Pallas kernel (TPU), or the general vmapped "
                        "env (off)")
    p.add_argument("--policy-impl", type=str, default="xla",
                   choices=["xla", "pallas"],
                   help="acting-path policy forward: flax/XLA or the fused "
                        "VMEM-resident MLP kernel (ops/mlp_pallas.py, TPU)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 MXU passes for all f32 matmuls "
                        "(jax_default_matmul_precision=bfloat16)")
    p.add_argument("--save-episodes", action="store_true",
                   help='dump training episodes to <result>/episodes/ '
                        '(s["Custom Settings"]["Save Episode"])')
    return p


# Per-driver RL defaults lifted from the reference drivers' argparse + solver
# blocks: (width, iex, Experiences Between Policy Updates, ER Start Size,
# ER Maximum Size).  "el" marks the burger/ks episode-length scaling
# (run-vracer-burger.py:162-167: 20000 * episodelength // 500).
RL_DEFAULTS = {
    # run-vracer-burger.py / -marl: width 256, iex 0.1, expperu 0.5
    "burger": (256, 0.1, 0.5, "el"),
    "burger-marl": (256, 0.1, 0.5, "el"),
    # run-vracer-burger-fd.py: width 32, iex 0.005
    "burger-fd": (32, 0.005, 0.5, "el"),
    # run-vracer-burger-jax.py: width 256, iex 0.01
    "burger-jax": (256, 0.01, 0.5, "el"),
    # run-vracer-coupled-burger.py: width 256, iex 0.1
    "coupled-burger": (256, 0.1, 0.5, "el"),
    # run-vracer-ks.py: width 256, iex 1e-3, expperu 0.5
    "ks": (256, 1e-3, 0.5, "el"),
    # run-vracer-diffusion-simple.py:10-11,76,104-105
    "diffusion-simple": (128, 3.0, 1.0, (32768, 2**20)),
    # run-vracer-advection-simple.py:11-12,77,105-106
    "advection-simple": (128, 0.05, 1.0, (32768, 2**20)),
    # run-vracer-diffusion.py: width 128, iex 3, ER 16384/524288
    "diffusion-stencil3": (128, 3.0, 1.0, (16384, 524288)),
    # run-vracer-diffusion-error.py: width 128, iex 0.01, ER 16384/524288
    "diffusion-error": (128, 0.01, 1.0, (16384, 524288)),
    # run-vracer-laplace.py: width 128, iex 0.1, ER 262144/524288
    "laplace": (128, 0.1, 1.0, (262144, 524288)),
}


def resolve_rl_defaults(args):
    """Fill width/iex/expperu/rstart/rmax from the reference driver's values
    when not given on the command line."""
    width, iex, expperu, er = RL_DEFAULTS.get(args.workload,
                                              (256, 0.1, 0.5, "el"))
    if er == "el":
        er = (20000 * args.episodelength // 500,
              100000 * args.episodelength // 500)
    return dict(
        width=args.width if args.width is not None else width,
        iex=args.iex if args.iex is not None else iex,
        expperu=args.expperu if args.expperu is not None else expperu,
        rstart=args.rstart if args.rstart is not None else er[0],
        rmax=args.rmax if args.rmax is not None else er[1])


def make_workload(args):
    """Build (env, rl_cfg, tc) from CLI args; defaults follow the drivers."""
    from marlpde_tpu.envs import registry
    from marlpde_tpu.train import trainer

    w = args.workload
    kw = {}
    if w in ("burger", "burger-marl", "burger-fd", "burger-jax"):
        defaults = dict(N=32, NA=32, dt=1e-3, T=5.0, nu=0.02, ic="sinus",
                        gamma=1.0)
        if w == "burger-fd":
            defaults.update(N=256, NA=256, ic="turbulence")
        kw = dict(
            N_dns=args.NDNS,
            grid_size=args.N or defaults["N"],
            num_actions=args.NA or defaults["NA"],
            num_agents=args.nagents or (32 if w == "burger-marl" else 1),
            L=args.L, dt=args.dt or defaults["dt"], T=args.T or defaults["T"],
            nu=args.nu or defaults["nu"], episode_length=args.episodelength,
            ic_case=args.ic or defaults["ic"], spectral_reward=args.specreward,
            forcing=args.forcing, dforce=args.dforce, ssmforce=args.ssmforce,
            noise=args.noise, seed=args.seed, stepper=args.stepper,
            nunoise=args.nunoise, version=args.version,
            ssm=args.ssm, dsm=args.dsm)
        if w == "burger-fd":
            kw["scheme"] = "fd"
            w = "burger"
        elif kw["num_agents"] > 1 and w != "burger-jax":
            w = "burger"
        if w != "burger-jax":
            kw["fast"] = args.fast
        env = registry.make_env(w, n_dns=args.ndns, **kw)
        gamma = args.gamma if args.gamma is not None else 1.0
    elif w == "coupled-burger":
        # run-vracer-coupled-burger.py:5-15 + coupled_burger_environment.py:7-11:
        # DNS N=512, nu=0.01, dt=1e-3, tEnd=5, ic='box', 1 action, reward
        # relative to an uncontrolled lock-step baseline, actions in [-1, 1].
        env = registry.make_env(
            "coupled-burger", n_dns=args.ndns,
            N_dns=args.NDNS, grid_size=args.N or 32,
            num_actions=args.NA or 1, num_agents=args.nagents or 1,
            L=args.L, dt=args.dt or 1e-3, T=args.T or 5.0,
            nu=args.nu or 0.01, episode_length=args.episodelength,
            ic_case=args.ic or "box", noise=args.noise, seed=args.seed)
        gamma = args.gamma if args.gamma is not None else 1.0
    elif w == "ks":
        # env-module defaults N_dns=1024, dt=0.25 (ks_environment.py:5-12);
        # the production launcher overrides NDNS=2048, dt=0.1, iex=1e-4
        # (runs/launcher_ks.sh:7-10)
        env = registry.make_env(
            "ks", N_dns=args.NDNS if args.NDNS != 512 else 1024,
            grid_size=args.N or 32, num_actions=args.NA or 32,
            num_agents=args.nagents or 1,
            dt=args.dt or 0.25,
            episode_length=args.episodelength, noise=args.noise,
            seed=args.seed, n_dns=args.ndns)
        gamma = args.gamma if args.gamma is not None else 1.0
    elif w in ("diffusion-simple", "diffusion-error", "diffusion-stencil3"):
        env = registry.make_env(
            w, N=args.N or 128, num_agents=args.nagents or 1,
            dt=args.dt or 0.01, nu=args.nu or 0.1,
            episode_length=args.episodelength,
            ic_case=args.ic or "sinus", noise=args.noise if args.noise else 0.5)
        # run-vracer-diffusion.py:76 uses Discount Factor 1.0; the simple and
        # error variants use 0.95
        gamma = (args.gamma if args.gamma is not None
                 else (1.0 if w == "diffusion-stencil3" else 0.95))
    elif w == "advection-simple":
        env = registry.make_env(
            w, N=args.N or 32, num_agents=args.nagents or 1,
            dt=args.dt or 0.01, nu=args.nu or 0.5,
            episode_length=args.episodelength, noise=args.noise)
        gamma = args.gamma if args.gamma is not None else 0.95
    elif w == "laplace":
        env = registry.make_env(
            w, num_agents=args.nagents or 32, dt=args.dt or 0.01,
            episode_length=args.episodelength if args.episodelength != 500 else 100,
            noise=args.noise, sforce=args.force)
        gamma = args.gamma if args.gamma is not None else 0.95
    else:
        raise SystemExit(f"unknown workload {w}")

    d = resolve_rl_defaults(args)
    # Exploration ceiling default: an order of magnitude above the driver's
    # Initial Exploration Noise, never beyond half the action range.  The
    # flagship A/B/C (runs 905/907/908, results/flagship_r3/) shows test
    # returns improve while sigma stays O(iex) and flatline/degrade once the
    # ratchet passes ~10x iex; half-range alone (908) still let the late
    # phase erode the final policy back to the uncontrolled baseline.
    sigma_max = (args.sigma_max if args.sigma_max is not None
                 else min((env.action_high - env.action_low) / 2.0,
                          10.0 * d["iex"]))
    extra = {}
    if args.beta0 is not None:
        extra["refer_beta"] = args.beta0
    if args.trust is not None:
        extra["trust_region"] = args.trust
    if args.rscale is not None:
        extra["reward_scale_source"] = args.rscale
    if args.offtarget is not None:
        extra["offpolicy_target"] = args.offtarget
    # Scale-robust learner defaults per workload (docs/REFER_SCALE.md): the
    # korali-exact settings measurably CANNOT learn where iex << action range
    # (ks: beta collapse 0.3 -> 2e-5, runs/ks_916.log) or where one agent
    # owns >=32 action dims (diffusion-simple default: flat 330k updates).
    # --muparam absolute / --no-dimnorm restore korali-exact semantics.
    scale_robust = w in ("ks", "diffusion-simple", "diffusion-error",
                         "diffusion-stencil3")
    if args.muparam is not None:
        extra["mu_param"] = args.muparam
    elif scale_robust:
        extra["mu_param"] = "sigma_relative"
    if args.dimnorm is not None:
        extra["cutoff_dim_norm"] = args.dimnorm
    elif scale_robust:
        extra["cutoff_dim_norm"] = True
    rl_cfg = trainer.default_rl_config(
        env, width=d["width"], gamma=gamma, lr=args.lr, init_noise=d["iex"],
        multi_agent_relationship=args.mar,
        multi_agent_correlation=args.mac,
        policy_impl=args.policy_impl, sigma_max=sigma_max,
        minibatch_mode=args.minibatch, mini_batch_size=args.mbsize,
        experiences_between_updates=d["expperu"],
        replay_start_experiences=d["rstart"],
        replay_max_experiences=d["rmax"], **extra)
    # korali always counts LIVE experiences toward NE and the update ledger;
    # the padded accounting is only kept for the fused one-dispatch TPU path
    # (fixed-length episodes make the two identical there).
    realexp = args.realexp or not args.fused
    tc = trainer.TrainerConfig(num_envs=args.numenvs, max_experiences=args.NE,
                               reuse_ratio=args.mbsize / d["expperu"],
                               max_updates_per_gen=args.maxupd,
                               seed=args.seed, fused=args.fused,
                               testing_frequency=args.testfreq,
                               testing_episodes=args.testepisodes,
                               count_real_experiences=realexp,
                               decay_diagnostics=args.diag)
    if args.save_episodes:
        tc = dataclasses.replace(
            tc, save_episodes_dir=f"_result_{args.workload}_{args.run}/episodes")
    return env, rl_cfg, tc


def run_cmaes(args):
    """run-cmaes-burger.py equivalent: CMA-ES over the Smagorinsky constant."""
    from marlpde_tpu.rl import cmaes

    f = cmaes.make_burger_cs_objective(
        N_dns=args.NDNS, grid_size=args.N or 32, dt=args.dt or 1e-3,
        T=args.T or 5.0, nu=args.nu or 0.02,
        episode_length=args.episodelength, ic_case=args.ic or "turbulence",
        seed=args.seed)
    cfg = cmaes.CmaesConfig(dim=1, population=args.pop, lower=0.0, upper=1.0,
                            max_generations=args.numgen, seed=args.seed)
    best_x, best_cost, hist = cmaes.cmaes_minimize(f, cfg)
    print(json.dumps({"workload": "cmaes-burger", "best_cs": float(best_x[0]),
                      "best_objective": -best_cost,
                      "generations": len(hist)}))


def main(argv=None):
    args = build_parser().parse_args(argv)
    # persistent compilation cache: the axon remote-compile tunnel is slow
    # and occasionally drops mid-run; cached executables let a retry go
    # straight to execution (same setup as bench.py).  The directory is
    # keyed by the host CPU's feature set: XLA:CPU AOT executables are
    # machine-specific, and reusing another machine's cache floods stderr
    # with cpu_aot_loader "machine feature not supported" errors.
    try:
        import hashlib
        import platform
        try:
            with open("/proc/cpuinfo") as f:
                flags = [ln for ln in f if ln.startswith("flags")][0]
        except Exception:
            flags = platform.processor()
        tag = hashlib.sha1(flags.encode()).hexdigest()[:8]
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         f"/tmp/jax_comp_cache_{tag}"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    if args.bf16:
        import jax
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    # heartbeat for tunnel-backed runs: silent-compile wedges (run 921,
    # 24 min with zero output) become diagnosable from the log — TPU_NOTES
    # rule 9 gives the wait/kill decision procedure.  Started BEFORE any jax
    # call: even jax.default_backend() can block minutes on a lingering
    # tunnel claim (rule 4).  CPU runs (JAX_PLATFORMS=cpu, the test path)
    # skip it.
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        from marlpde_tpu.utils import heartbeat
        heartbeat.start()
        heartbeat.phase("backend-init")
    if args.workload == "cmaes-burger":
        return run_cmaes(args)
    from marlpde_tpu.train import trainer
    from marlpde_tpu.utils import checkpoint as ckpt

    env, rl_cfg, tc = make_workload(args)
    result_dir = f"_result_{args.workload}_{args.run}"
    os.makedirs(result_dir, exist_ok=True)

    if args.mesh and not args.test:
        import jax
        from marlpde_tpu.parallel import mesh as pmesh
        pmesh.initialize_distributed()
        mesh = pmesh.make_mesh()
        n_dev = mesh.devices.size
        if args.numenvs % n_dev:
            raise SystemExit(f"--numenvs {args.numenvs} must divide the "
                             f"device count {n_dev}")
        per_dev = args.numenvs // n_dev
        T = env.episode_length
        # same korali economics as the single-chip trainer, honoring the
        # configured minibatch mode (experience: numenvs*T/expperu updates/gen
        # at global minibatch mbsize; episode: reuse over K*T minibatches) —
        # previously the mesh branch silently forced episode-mode replay under
        # experience-mode economics (ADVICE r3, medium)
        upd = trainer.updates_per_generation(rl_cfg, tc, T)
        n_gens = max(1, int(tc.max_experiences // (args.numenvs * T)))
        init_ts = init_history = init_key = None
        if args.resume:
            ckpt.check_fingerprint(result_dir, rl_cfg, "--resume")
            init_ts = ckpt.load_train_state(result_dir, rl_cfg)
            init_history = ckpt.load_history(result_dir)
            meta = ckpt.load_meta(result_dir)
            if meta is not None:
                init_key = meta["key"]
            done_gens = init_history["gen"][-1] if init_history else 0
            n_gens = max(0, n_gens - done_gens)
        ts, rep, history = pmesh.run_generations(
            env, rl_cfg, mesh, envs_per_device=per_dev, updates_per_gen=upd,
            n_generations=n_gens, seed=args.seed, verbose=True,
            init_ts=init_ts, history=init_history, init_key=init_key,
            testing_frequency=args.testfreq, testing_episodes=args.testepisodes,
            checkpoint_dir=result_dir, checkpoint_every=25)
        ckpt.save_train_state(result_dir, jax.device_get(ts), history)
        print(json.dumps({"workload": args.workload, "mesh_devices": int(n_dev),
                          "final_mean_return": history["mean_return"][-1],
                          "generations": history["gen"][-1]}))
        return

    if args.learner == "apg" and not args.test:
        import jax
        from marlpde_tpu.rl import apg
        iters = max(1, int(args.NE // (args.numenvs * env.episode_length)))
        ts, history = apg.train_apg(
            env, rl_cfg,
            apg.ApgConfig(iterations=iters, batch_size=args.numenvs,
                          lr=args.lr if args.lr != 1e-4 else 1e-3),
            key=jax.random.key(args.seed))
        ckpt.save_train_state(result_dir, ts, history)
        print(json.dumps({"workload": args.workload, "learner": "apg",
                          "final_mean_return": history["mean_return"][-1],
                          "iterations": history["iter"][-1] + 1}))
        return

    if args.test:
        import jax
        load_dir = (os.path.join(result_dir, "best") if args.best
                    else result_dir)
        # the fingerprint lives in the run dir's meta.npz (best/ holds only
        # params); a best-checkpoint test still verifies against the run dir
        ckpt.check_fingerprint(result_dir, rl_cfg, "--test")
        ts = ckpt.load_train_state(load_dir, rl_cfg)
        if ts is None:
            raise SystemExit(f"--test: no checkpoint in {load_dir}")
        rets = trainer.evaluate(env, rl_cfg, ts, jax.random.key(args.seed),
                                args.testepisodes)
        r = np.asarray(rets)
        per_episode = r.mean(-1) if r.ndim > 1 else r   # mean over agents only
        summary = {"workload": args.workload,
                   "test_mean_return": float(np.mean(rets)),
                   "test_returns": per_episode.tolist()}
        if args.workload in ("burger", "burger-marl", "burger-fd",
                             "coupled-burger"):
            # reference test mode (run-vracer-burger.py:203-210 ->
            # burger_testing_environment.py + burger_environment.py:241-329):
            # sweep the DNS pool (or --ids Testing Sample Ids) dumping
            # relError/sgsTerms/dnsSgsTerms .npy per --nus viscosity, then
            # the controlled-vs-uncontrolled comparison + makePlot.
            from marlpde_tpu.analysis import evaluation
            ids = ([int(x) for x in args.ids.split(",")]
                   if args.ids else None)
            nus = ([float(x) for x in args.nus.split(",")]
                   if args.nus else [None])
            summary["nus"] = [n for n in nus if n is not None]
            for nu_t in nus:
                if nu_t is None:
                    env_t, suffix = env, ""
                else:
                    sub = argparse.Namespace(**vars(args))
                    sub.nu, sub.test, sub.nus = nu_t, False, None
                    env_t, _, _ = make_workload(sub)
                    suffix = f"_nu{nu_t:g}"
                evaluation.evaluate_policy(
                    env_t.cfg, env_t.consts, rl_cfg, ts, out_dir=result_dir,
                    run_tag=args.run, key=jax.random.key(args.seed),
                    sample_ids=ids, file_suffix=suffix)
                cmp_ = evaluation.compare_with_uncontrolled(
                    env_t.cfg, env_t.consts, rl_cfg, ts,
                    key=jax.random.key(args.seed),
                    sidx=(ids[0] if ids else 0),
                    file_prefix=os.path.join(result_dir, f"test{suffix}"))
                summary["baseline_cumreward" + suffix] = float(
                    np.mean(cmp_["baseline_cumreward"]))
                summary["controlled_cumreward" + suffix] = float(
                    np.mean(cmp_["controlled_cumreward"]))
            summary["baseline_cumreward"] = summary.get(
                "baseline_cumreward", summary.get("baseline_cumreward" + (
                    f"_nu{nus[0]:g}" if nus[0] is not None else "")))
            summary["controlled_cumreward"] = summary.get(
                "controlled_cumreward", summary.get("controlled_cumreward" + (
                    f"_nu{nus[0]:g}" if nus[0] is not None else "")))
        elif args.workload == "ks":
            # KS testing branch (ks_environment.py:122-183): controlled-LES
            # npz dump, DNS SGS terms, uncontrolled baseline, makePlot.
            # With a multi-row DNS pool the comparison AVERAGES over pool
            # rows (--ids to select): the single-episode spectral score is
            # chaos-dominated (an O(1e-11) action perturbation decorrelates
            # the trajectory and moves the score ~+-0.01 — measured round 5,
            # scripts/ks_gain_mean.py), so only the pool mean is a
            # statistically meaningful controlled-vs-uncontrolled verdict.
            from marlpde_tpu.analysis import evaluation
            n_pool = int(np.asarray(env.consts.nu.shape[0]))
            ids = ([int(x) for x in args.ids.split(",")] if args.ids
                   else list(range(min(n_pool, 8))))
            base_l, ctrl_l = [], []
            for sidx in ids:
                cmp_ = evaluation.ks_testing(
                    env.cfg, env.consts, rl_cfg, ts, out_dir=result_dir,
                    run_tag=f"{args.run}_s{sidx}" if len(ids) > 1 else args.run,
                    key=jax.random.key(args.seed), sidx=sidx)
                base_l.append(float(np.mean(cmp_["baseline_cumreward"])))
                ctrl_l.append(float(np.mean(cmp_["controlled_cumreward"])))
            summary["sample_ids"] = ids
            summary["baseline_per_id"] = base_l
            summary["controlled_per_id"] = ctrl_l
            summary["baseline_cumreward"] = float(np.mean(base_l))
            summary["controlled_cumreward"] = float(np.mean(ctrl_l))
        elif args.workload == "laplace":
            # plotting_laplace.py:13-90 testing plots (gradient panels)
            from marlpde_tpu.analysis import evaluation
            evaluation.laplace_testing(env, rl_cfg, ts, out_dir=result_dir,
                                       key=jax.random.key(args.seed))
        elif args.workload in ("diffusion-simple", "diffusion-error",
                               "diffusion-stencil3", "advection-simple"):
            # diffusion_environment_simple.py:76-81 testing plots
            from marlpde_tpu.analysis import evaluation
            evaluation.simple_env_testing(env, rl_cfg, ts, out_dir=result_dir,
                                          key=jax.random.key(args.seed))
        print(json.dumps(summary))
        return

    # File Output Frequency = 25 (run-vracer-burger.py:199); trainer writes
    # train state + history + RNG/counter meta (+ replay when serialized)
    tc = dataclasses.replace(tc, checkpoint_dir=result_dir,
                             serialize_replay=args.serialize_replay)

    init_ts = init_history = init_replay = init_key = init_counters = None
    if args.resume:
        ckpt.check_fingerprint(result_dir, rl_cfg, "--resume")
        init_ts = ckpt.load_train_state(result_dir, rl_cfg)
        init_history = ckpt.load_history(result_dir)
        init_replay = ckpt.load_replay(result_dir,
                                       trainer.make_replay(env, rl_cfg))
        meta = ckpt.load_meta(result_dir)
        if meta is not None:
            init_key = meta["key"]
            init_counters = {k: meta[k]
                             for k in ("gen", "total_exp", "episode_base",
                                       "real_in_replay") if k in meta}
        if init_ts is not None:
            print(f"[run] continuing from previous run in {result_dir} "
                  f"(replay={'yes' if init_replay is not None else 'no'}, "
                  f"meta={'yes' if meta is not None else 'no'})")

    ts, rep, history = trainer.train(env, rl_cfg, tc,
                                     init_ts=init_ts, init_history=init_history,
                                     init_replay=init_replay, init_key=init_key,
                                     init_counters=init_counters)
    print(json.dumps({"workload": args.workload,
                      "final_mean_return": history["mean_return"][-1],
                      "generations": history["gen"][-1]}))


if __name__ == "__main__":
    main()
