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
