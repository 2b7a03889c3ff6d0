"""Diagnostics/analysis tests: Ek family, SGS extraction, error-curve schema,
checkpoint roundtrip, CLI workload construction."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlpde_tpu.analysis import diagnostics
from marlpde_tpu.core import ic
from marlpde_tpu.solvers import burger
from marlpde_tpu.utils import checkpoint as ckpt


class TestComputeEk:
    def test_matches_reference_formulas(self, rng):
        # Burger.py:541-576 literal re-derivation
        T, N, dx = 10, 16, 0.1
        vv = rng.standard_normal((T, N)) + 1j * rng.standard_normal((T, N))
        out = diagnostics.compute_ek(jnp.asarray(vv), dx)
        ek_kt = 0.5 * np.real(vv.conj() * vv / N) * dx
        np.testing.assert_allclose(out["Ek_kt"], ek_kt, rtol=1e-12)
        np.testing.assert_allclose(out["Ek_k"], ek_kt.sum(0) / T, rtol=1e-12)
        np.testing.assert_allclose(out["Ek_t"], ek_kt.sum(1), rtol=1e-12)
        want_ktt = np.cumsum(ek_kt, 0) / np.arange(1, T + 1)[:, None]
        np.testing.assert_allclose(out["Ek_ktt"], want_ktt, rtol=1e-12)


class TestComputeSgs:
    def _reference_sgs(self, uu, k, dx, dt, nu, nURG):
        """Literal re-derivation of Burger.py:677-736 (functional, no aliasing)."""
        n_frames, N = uu.shape
        hidx = np.abs(k) > nURG // 2
        r = nURG / N
        sgs = np.zeros_like(uu)
        sgs_alt = np.zeros_like(uu)
        sgs_alt2 = np.zeros((n_frames, nURG))
        for idx in range(n_frames):
            dtidx = idx + 1 if idx < n_frames - 1 else idx - 1
            vpt = np.fft.fft(uu[dtidx])
            vpth = vpt.copy(); vpth[hidx] = 0
            uhpt = np.real(np.fft.ifft(vpth))
            uhpt_alt2 = np.real(np.fft.ifft(
                np.concatenate((vpt[:(nURG + 1) // 2], vpt[-(nURG - 1) // 2:])))) * r
            u = uu[idx]
            v = np.fft.fft(u); v2 = np.fft.fft(u * u)
            vh = v.copy(); vh[hidx] = 0
            v2h = v2.copy(); v2h[hidx] = 0
            uh = np.real(np.fft.ifft(vh))
            u2h = np.real(np.fft.ifft(v2h))
            uh_alt2 = np.real(np.fft.ifft(
                np.concatenate((v[:(nURG + 1) // 2], v[-(nURG - 1) // 2:])))) * r
            duhdt = (uhpt - uh) / dt
            duhdt_alt2 = (uhpt_alt2 - uh_alt2) / dt
            if idx == n_frames - 1:
                duhdt *= -1; duhdt_alt2 *= -1
            duhdx = (uh - np.roll(uh, 1)) / dx
            d2uhdx2 = (np.roll(uh, -1) - 2 * uh + np.roll(uh, 1)) / dx**2
            du2hdx = (u2h - np.roll(u2h, 1)) / dx
            duhdx_a2 = (uh_alt2 - np.roll(uh_alt2, 1)) / dx * r
            d2uhdx2_a2 = (np.roll(uh_alt2, -1) - 2 * uh_alt2 + np.roll(uh_alt2, 1)) / dx**2 * r * r
            sgs[idx] = -uh * duhdx + 0.5 * du2hdx
            sgs_alt[idx] = duhdt + uh * duhdx - nu * d2uhdx2
            sgs_alt2[idx] = duhdt_alt2 + uh_alt2 * duhdx_a2 - nu * d2uhdx2_a2
        return sgs, sgs_alt, sgs_alt2

    def test_matches_reference_formulas(self):
        N, L, dt, nu, g = 64, 2 * np.pi, 0.01, 0.05, 16
        x = jnp.asarray(np.linspace(0, L, N, endpoint=False))
        u0 = ic.burger_turbulence(3, 0.0, x, L)
        cfg = burger.BurgerConfig(N=N, L=L, dt=dt, nu=nu)
        _, uu, _ = burger.simulate(cfg, burger.init(cfg, u0=u0), 20)
        k = cfg.grid.k
        out = diagnostics.compute_sgs_burger(uu, k, cfg.grid.dx, dt, nu, g)
        want = self._reference_sgs(np.asarray(uu), k, cfg.grid.dx, dt, nu, g)
        np.testing.assert_allclose(out["sgs"], want[0], atol=1e-10)
        np.testing.assert_allclose(out["sgs_alt"], want[1], atol=1e-8)
        np.testing.assert_allclose(out["sgs_alt2"], want[2], atol=1e-8)


class TestErrorCurves:
    def test_schema_matches_reference_jsons(self, tmp_path, rng):
        uu = rng.standard_normal((5, 8))
        sol = rng.standard_normal((5, 8))
        tt = np.arange(5) * 0.01
        curves = diagnostics.error_curves(uu, sol, tt)
        assert set(curves) == {"t", "mse", "linf", "mass"}   # error_8.json keys
        p = tmp_path / "error_8.json"
        diagnostics.write_error_json(str(p), curves)
        back = json.load(open(p))
        np.testing.assert_allclose(back["mse"], np.mean((uu - sol) ** 2, 1))
        np.testing.assert_allclose(back["mass"], uu.sum(1))


class TestCheckpoint:
    def test_train_state_roundtrip(self, tmp_path):
        from marlpde_tpu.rl import vracer
        cfg = vracer.VracerConfig(obs_dim=4, act_dim=2, width=8)
        ts = vracer.init_train(cfg, jax.random.key(0))
        ckpt.save_train_state(str(tmp_path), ts, {"gen": [1]})
        back = ckpt.load_train_state(str(tmp_path), cfg)
        for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert ckpt.load_history(str(tmp_path)) == {"gen": [1]}

    def test_load_missing_returns_none(self, tmp_path):
        assert ckpt.load_train_state(str(tmp_path / "nope")) is None

    def test_orbax_backend_roundtrip(self, tmp_path):
        from marlpde_tpu.rl import vracer
        cfg = vracer.VracerConfig(obs_dim=4, act_dim=2, width=8)
        ts = vracer.init_train(cfg, jax.random.key(3))
        ckpt.save_train_state(str(tmp_path), ts, backend="orbax")
        assert (tmp_path / "latest_orbax").is_dir()
        back = ckpt.load_train_state(str(tmp_path), cfg, backend="orbax")
        assert type(back) is type(ts)
        for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_meta_roundtrip(self, tmp_path):
        key = jax.random.fold_in(jax.random.key(7), 13)
        ckpt.save_meta(str(tmp_path), key, gen=5, total_exp=1e4,
                       episode_base=80)
        m = ckpt.load_meta(str(tmp_path))
        assert (m["gen"], m["total_exp"], m["episode_base"]) == (5, 1e4, 80)
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(m["key"])),
            np.asarray(jax.random.key_data(key)))
        assert ckpt.load_meta(str(tmp_path / "nope")) is None

    def test_meta_fingerprint_roundtrip_and_mismatch(self, tmp_path):
        # round-5 (ADVICE r4 medium): mu_param/cutoff_dim_norm persisted in
        # meta.npz; a cross-mode restore must fail loudly, not silently
        # rescale the policy mean
        from marlpde_tpu.rl import vracer
        key = jax.random.key(3)
        cfg = vracer.VracerConfig(obs_dim=4, act_dim=2, num_agents=1,
                                  episode_length=5, action_low=-1.0,
                                  action_high=1.0, mu_param="sigma_relative",
                                  cutoff_dim_norm=True)
        ckpt.save_meta(str(tmp_path), key, gen=1, total_exp=10,
                       episode_base=2, rl_cfg=cfg)
        m = ckpt.load_meta(str(tmp_path))
        assert m["mu_param"] == "sigma_relative" and m["cutoff_dim_norm"]
        ckpt.check_fingerprint(str(tmp_path), cfg)   # match: no raise
        import dataclasses as dc
        import pytest as pt
        bad = dc.replace(cfg, mu_param="absolute")
        with pt.raises(SystemExit):
            ckpt.check_fingerprint(str(tmp_path), bad)
        # pre-fingerprint checkpoints only warn
        ckpt.save_meta(str(tmp_path / "old"), key, gen=1, total_exp=10,
                       episode_base=2)
        ckpt.check_fingerprint(str(tmp_path / "old"), cfg)

    def test_replay_roundtrip_episode_layout(self, tmp_path):
        from marlpde_tpu.rl import replay as replay_mod
        rep = replay_mod.init(3, 4, 2, 5, 1)
        rep = rep.replace(truncated=rep.truncated.at[1].set(True),
                          filled=jax.numpy.asarray(2, jax.numpy.int32))
        ckpt.save_replay(str(tmp_path), rep)
        back = ckpt.load_replay(str(tmp_path), replay_mod.init(3, 4, 2, 5, 1))
        for a, b in zip(jax.tree.leaves(rep), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_replay_roundtrip_flat_layout_with_refer_metadata(self, tmp_path):
        from marlpde_tpu.rl import replay_flat
        rep = replay_flat.init_flat(8, 8, 2, 5, 1)
        rep = rep.replace(vtg=rep.vtg + 2.0, rho=rep.rho * 0.5,
                          off=rep.off.at[3].set(True),
                          truncated_ep=rep.truncated_ep.at[1].set(True),
                          cursor=jax.numpy.asarray(6, jax.numpy.int32))
        ckpt.save_replay(str(tmp_path), rep)
        back = ckpt.load_replay(str(tmp_path), replay_flat.init_flat(8, 8, 2, 5, 1))
        for a, b in zip(jax.tree.leaves(rep), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestKillAndResume:
    """Complete resume semantics (korali e.loadState + Experience Replay
    Serialize, run-vracer-burger.py:59-62,196): a run killed mid-way and
    resumed from its checkpoint must continue BITWISE-identically to an
    uninterrupted run — train state, replay, RNG stream and counters all
    restored."""

    def _env_cfg(self):
        from marlpde_tpu.envs import registry
        from marlpde_tpu.train import trainer
        env = registry.make_env("diffusion-simple", N=8, num_agents=1,
                                episode_length=6, noise=0.0)
        rl = trainer.default_rl_config(env, width=8,
                                       replay_start_experiences=12,
                                       replay_max_experiences=120)
        return env, rl

    @pytest.mark.parametrize("minibatch_mode", ["episode", "experience"])
    def test_bitwise_continuation(self, tmp_path, minibatch_mode):
        import dataclasses
        from marlpde_tpu.train import trainer
        env, rl = self._env_cfg()
        rl = dataclasses.replace(rl, minibatch_mode=minibatch_mode,
                                 mini_batch_size=8)
        full = trainer.TrainerConfig(num_envs=2, max_experiences=48, seed=11,
                                     max_updates_per_gen=3)
        ts_a, rep_a, h_a = trainer.train(env, rl, full, verbose=False)

        # part 1: stop at half, checkpointing every generation
        part1 = dataclasses.replace(full, max_experiences=24,
                                    checkpoint_dir=str(tmp_path),
                                    checkpoint_every=1, serialize_replay=True)
        trainer.train(env, rl, part1, verbose=False)
        # part 2: resume everything and finish
        init_ts = ckpt.load_train_state(str(tmp_path), rl)
        init_hist = ckpt.load_history(str(tmp_path))
        init_rep = ckpt.load_replay(str(tmp_path),
                                    trainer.make_replay(env, rl))
        meta = ckpt.load_meta(str(tmp_path))
        assert meta is not None and init_rep is not None
        ts_b, rep_b, h_b = trainer.train(
            env, rl, full, verbose=False, init_ts=init_ts,
            init_history=init_hist, init_replay=init_rep,
            init_key=meta["key"],
            init_counters={k: meta[k]
                           for k in ("gen", "total_exp", "episode_base")})

        assert h_b["gen"] == h_a["gen"]
        np.testing.assert_array_equal(h_b["mean_return"], h_a["mean_return"])
        for a, b in zip(jax.tree.leaves(ts_a.params),
                        jax.tree.leaves(ts_b.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(rep_a), jax.tree.leaves(rep_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_cli_resume_restores_replay_and_meta(self, tmp_path, monkeypatch):
        from marlpde_tpu import run as cli
        monkeypatch.chdir(tmp_path)
        base = ["diffusion-simple", "--N", "8", "--episodelength", "10",
                "--NE", "160", "--numenvs", "4", "--width", "8",
                "--noise", "0", "--serialize-replay"]
        cli.main(base)
        res = tmp_path / "_result_diffusion-simple_0"
        assert (res / "replay.npz").exists() and (res / "meta.npz").exists()
        cli.main(base + ["--resume", "--NE", "320"])
        h2 = json.load(open(res / "history.json"))
        assert h2["experiences"][-1] >= 320


class TestCli:
    @pytest.mark.parametrize("workload", [
        "diffusion-simple", "diffusion-error", "advection-simple", "laplace"])
    def test_make_workload_builds(self, workload):
        from marlpde_tpu import run as cli
        args = cli.build_parser().parse_args([workload, "--episodelength", "10"])
        env, rl_cfg, tc = cli.make_workload(args)
        assert env.episode_length == 10
        assert rl_cfg.obs_dim == env.obs_dim

    def test_burger_workload_with_flags(self):
        from marlpde_tpu import run as cli
        args = cli.build_parser().parse_args([
            "burger", "--NDNS", "64", "--N", "16", "--NA", "16",
            "--dt", "0.01", "--T", "0.2", "--nu", "0.05",
            "--ic", "turbulence", "--specreward", "--episodelength", "5"])
        env, rl_cfg, tc = cli.make_workload(args)
        assert env.cfg.grid_size == 16
        assert env.cfg.spectral_reward

    def test_end_to_end_tiny_training_run(self, tmp_path, monkeypatch):
        from marlpde_tpu import run as cli
        monkeypatch.chdir(tmp_path)
        cli.main(["diffusion-simple", "--N", "8", "--episodelength", "10",
                  "--NE", "320", "--numenvs", "4", "--width", "8",
                  "--noise", "0"])
        assert os.path.exists(tmp_path / "_result_diffusion-simple_0" / "latest.pkl")
        # and --test mode loads it back
        cli.main(["diffusion-simple", "--N", "8", "--episodelength", "10",
                  "--numenvs", "4", "--width", "8", "--noise", "0", "--test"])

    def test_resume_continues_from_checkpoint(self, tmp_path, monkeypatch):
        from marlpde_tpu import run as cli
        monkeypatch.chdir(tmp_path)
        base = ["diffusion-simple", "--N", "8", "--episodelength", "10",
                "--NE", "160", "--numenvs", "4", "--width", "8", "--noise", "0"]
        cli.main(base)
        import json
        h1 = json.load(open(tmp_path / "_result_diffusion-simple_0" / "history.json"))
        cli.main(base + ["--resume", "--NE", "320"])
        h2 = json.load(open(tmp_path / "_result_diffusion-simple_0" / "history.json"))
        assert h2["experiences"][-1] > h1["experiences"][-1]
        assert h2["gen"][0] == h1["gen"][0]   # history preserved

    def test_serialize_replay_flag(self, tmp_path, monkeypatch):
        from marlpde_tpu import run as cli
        monkeypatch.chdir(tmp_path)
        cli.main(["diffusion-simple", "--N", "8", "--episodelength", "10",
                  "--NE", "160", "--numenvs", "4", "--width", "8",
                  "--noise", "0", "--serialize-replay"])
        assert (tmp_path / "_result_diffusion-simple_0" / "replay.npz").exists()


class TestConvergenceScript:
    """other/convergencerate.py parity harness (scripts/convergence.py)."""

    def test_small_study_orders_sensible(self, tmp_path, capsys):
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "convergence", os.path.join(os.path.dirname(__file__), "..",
                                        "scripts", "convergence.py"))
        conv = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(conv)
        conv.main(["--ndns", "128", "--dt-dns", "0.005", "--dt", "0.01",
                   "--tend", "0.3", "--nmin", "4", "--nmax", "5",
                   "--out-dir", str(tmp_path), "--no-plots"])
        import json
        with open(tmp_path / "convergence.json") as f:
            out = json.load(f)
        assert out["N"] == [16, 32]
        # refinement must not increase the error
        assert out["mse_rk3"][1] <= out["mse_rk3"][0]
        assert all(m > 0 for m in out["mse_abcn"])


class TestTestingArtifacts:
    """Non-Burgers testing-mode artifact sets (VERDICT r1 item 3): KS npz +
    makePlot (ks_environment.py:122-183), diffusion/advection testing plots
    (diffusion_environment_simple.py:76-81)."""

    def test_ks_testing_artifacts(self, tmp_path):
        from marlpde_tpu.analysis import evaluation
        from marlpde_tpu.envs import registry
        from marlpde_tpu.rl import vracer
        from marlpde_tpu.train import trainer
        env = registry.make_env("ks", N_dns=64, grid_size=16, num_actions=16,
                                t_transient=5.0, t_end=15.0, episode_length=5)
        rl = trainer.default_rl_config(env, width=8)
        ts = vracer.init_train(rl, jax.random.key(0))
        out = evaluation.ks_testing(env.cfg, env.consts, rl, ts,
                                    str(tmp_path), run_tag=3)
        d = np.load(tmp_path / "sgs_3.npz")
        assert set(d.files) >= {"x", "t", "uu", "vv", "L", "N", "dt", "nu",
                                "tEnd"}
        assert d["uu"].shape == (5, 16)
        assert np.isfinite(d["uu"]).all()
        sgs = np.load(tmp_path / "dnsSgs_3.npz")["sgs"]
        assert sgs.shape[-1] == 64 and np.isfinite(sgs).all()
        assert (tmp_path / "ks_3_evolution.png").exists()
        assert out["controlled_cumreward"].shape == (1,)
        assert np.isfinite(out["baseline_cumreward"]).all()

    @pytest.mark.parametrize("name,kw", [
        ("diffusion-simple", dict(N=8, episode_length=6, noise=0.0)),
        ("advection-simple", dict(N=8, episode_length=6)),
        ("laplace", dict(num_agents=8, episode_length=6)),
    ])
    def test_simple_env_testing_artifacts(self, tmp_path, name, kw):
        from marlpde_tpu.analysis import evaluation
        from marlpde_tpu.envs import registry
        from marlpde_tpu.rl import vracer
        from marlpde_tpu.train import trainer
        env = registry.make_env(name, **kw)
        rl = trainer.default_rl_config(env, width=8)
        ts = vracer.init_train(rl, jax.random.key(1))
        out = evaluation.simple_env_testing(env, rl, ts, str(tmp_path))
        for f in ("evolution.png", "actionfield.png", "actiondist.png",
                  "field.png"):
            assert (tmp_path / f).exists(), f
        assert out["uu"].shape == (6, kw.get("N", env.cfg.solver.N))
        if name != "laplace":
            assert out["solution"] is not None
            assert np.isfinite(out["solution"]).all()
            # the older inline-plot 3x6 truth/uncontrolled/controlled panel
            # (advection_environment.py:121-223)
            assert (tmp_path / "compare.png").exists()
            assert (tmp_path / "compare_evolution.png").exists()

    def test_cli_test_mode_writes_plots(self, tmp_path, monkeypatch):
        from marlpde_tpu import run as cli
        monkeypatch.chdir(tmp_path)
        base = ["advection-simple", "--N", "8", "--episodelength", "6",
                "--numenvs", "2", "--width", "8", "--noise", "0"]
        cli.main(base + ["--NE", "24"])
        cli.main(base + ["--test"])
        res = tmp_path / "_result_advection-simple_0"
        for f in ("evolution.png", "actionfield.png", "actiondist.png",
                  "field.png"):
            assert (res / f).exists(), f

    def test_cli_test_sample_ids_and_nu_sweep(self, tmp_path, monkeypatch):
        """Testing Sample Ids + viscosity sweep (run-vracer-burger.py:203-210):
        --ids pins pool rows, --nus rebuilds the DNS pool per viscosity and
        writes one artifact set per value."""
        from marlpde_tpu import run as cli
        monkeypatch.chdir(tmp_path)
        base = ["burger", "--NDNS", "32", "--N", "8", "--NA", "8", "--dt",
                "0.01", "--T", "0.05", "--episodelength", "5", "--numenvs",
                "2", "--width", "8", "--ndns", "3", "--rstart", "10",
                "--rmax", "100"]
        cli.main(base + ["--NE", "20"])
        cli.main(base + ["--test", "--ids", "0,2", "--nus", "0.02,0.05",
                         "--testepisodes", "2"])
        res = tmp_path / "_result_burger_0"
        for nu in ("0.02", "0.05"):
            rel = np.load(res / f"relError_0_nu{nu}.npy")
            assert rel.shape[0] == 2          # exactly the two sample ids
            assert (res / f"sgsTerms_0_nu{nu}.npy").exists()
            assert (res / f"dnsSgsTerms_0_nu{nu}.npy").exists()
            assert (res / f"test_nu{nu}.png").exists()


class TestMakePlotContent:
    """Pixel-independent content checks of makePlot's panel data (VERDICT r1
    item 7): the returned error curves / KDEs must match literal numpy
    re-derivations of the reference recipes (plotting.py:233-258,346-407)."""

    def _mk_inputs(self, rng, N=64, g=16, T=12, Td=40):
        x_d = np.linspace(0, 2 * np.pi, N, endpoint=False)
        x_l = np.linspace(0, 2 * np.pi, g, endpoint=False)
        tt_d = np.arange(Td) * 0.01
        tt_l = np.arange(1, T + 1) * (0.01 * 3)
        dns_uu = np.sin(x_d)[None] * np.cos(tt_d)[:, None]
        base_uu = np.sin(x_l)[None] * np.cos(tt_l)[:, None] * 0.9
        sgs_uu = np.sin(x_l)[None] * np.cos(tt_l)[:, None] * 0.99
        ek = lambda n, t: np.abs(rng.standard_normal((t, n))) + 0.5
        dns = dict(x=x_d, tt=tt_d, uu=dns_uu, ek_ktt=ek(N, Td),
                   sgs_history=rng.standard_normal((Td, N)))
        base = dict(x=x_l, tt=tt_l, uu=base_uu, ek_ktt=ek(g, T),
                    action_fields=rng.standard_normal((T, 4)))
        sgs = dict(x=x_l, tt=tt_l, uu=sgs_uu, ek_ktt=ek(g, T),
                   action_fields=rng.standard_normal((T, 4)),
                   sgs_history=rng.standard_normal((T, g)))
        return dns, base, sgs

    def test_panel_data_matches_reference_recipe(self, rng, tmp_path):
        from marlpde_tpu.analysis import plotting
        dns, base, sgs = self._mk_inputs(rng)
        prefix = str(tmp_path / "cmp")
        data = plotting.make_plot(dns, base, sgs, prefix, spectral=True)
        for f in ("cmp.png", "cmp_evolution.png", "cmp_action.png",
                  "cmp_action_closeup.png"):
            assert (tmp_path / f).exists(), f

        # spectral error curve: literal re-derivation (plotting.py:240-246)
        g = 16
        tidx = np.clip(np.searchsorted(dns["tt"], sgs["tt"] - 1e-12),
                       0, len(dns["tt"]) - 1)
        dk = dns["ek_ktt"][tidx][:, 1:g // 2]
        want = np.mean((np.abs(dk - sgs["ek_ktt"][:, 1:g // 2]) / dk) ** 2,
                       axis=1)
        np.testing.assert_allclose(data["controlled_errK_t"], want, rtol=1e-12)
        want_cum = np.cumsum(want) / np.arange(1, len(want) + 1)
        np.testing.assert_allclose(data["controlled_errK_cum"], want_cum,
                                   rtol=1e-12)

        # KDE panel: gaussian_kde of the subsampled DNS SGS terms
        from scipy.stats import gaussian_kde
        xi = (np.arange(64) % 4) == 0
        want_kde = gaussian_kde(dns["sgs_history"][:, xi].ravel())(
            data["sgs_kde_grid"])
        np.testing.assert_allclose(data["dns_sgs_kde"], want_kde, rtol=1e-10)

        # interpolation error: ~|0.99-1| * field scale for the controlled run
        assert data["controlled_errU"].shape == (12, 16)
        assert data["controlled_errU"].max() < data["no control_errU"].max()

    def test_mse_mode(self, rng, tmp_path):
        from marlpde_tpu.analysis import plotting
        dns, base, sgs = self._mk_inputs(rng)
        data = plotting.make_plot(dns, base, sgs, str(tmp_path / "m"),
                                  spectral=False)
        # mse curve equals mean squared interpolation error
        np.testing.assert_allclose(
            data["controlled_mse_t"],
            np.mean(data["controlled_errU"] ** 2, axis=1), rtol=1e-12)


class TestLaplaceTesting:
    def test_laplace_artifacts_and_gradient(self, tmp_path):
        from marlpde_tpu.analysis import evaluation
        from marlpde_tpu.envs import registry
        from marlpde_tpu.rl import vracer
        from marlpde_tpu.train import trainer
        env = registry.make_env("laplace", num_agents=8, episode_length=6)
        rl = trainer.default_rl_config(env, width=8)
        ts = vracer.init_train(rl, jax.random.key(2))
        out = evaluation.laplace_testing(env, rl, ts, str(tmp_path))
        for f in ("evolution.png", "actions.png", "hessian.png",
                  "actiondist.png", "field.png"):
            assert (tmp_path / f).exists(), f
        # gradient = centered FD laplacian of the recorded field
        uu = out["uu"]
        dx = 2 * np.pi / 9
        want = (np.roll(uu, -1, 1) - 2 * uu + np.roll(uu, 1, 1)) / dx**2
        np.testing.assert_allclose(out["gradient"], want, rtol=1e-6)
