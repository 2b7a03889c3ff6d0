"""Plotting smoke tests: every panel function writes a decodable PNG."""

import numpy as np
import pytest

from marlpde_tpu.analysis import plotting


@pytest.fixture
def traj(rng):
    T, N = 20, 32
    x = np.linspace(0, 2 * np.pi, N, endpoint=False)
    tt = np.arange(T) * 0.01
    uu = np.sin(x)[None, :] * np.exp(-0.05 * tt)[:, None]
    ek = np.abs(np.fft.fft(uu, axis=1)) ** 2
    return dict(x=x, tt=tt, uu=uu, ek_t=ek.sum(1),
                ek_ktt=np.cumsum(ek, 0) / np.arange(1, T + 1)[:, None],
                sgs_terms=rng.standard_normal((T, N)))


def _check_png(path):
    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 1000


class TestPlotting:
    def test_plot_field(self, tmp_path, traj):
        p = tmp_path / "f.png"
        plotting.plot_field(traj["x"], traj["uu"][0], str(p), title="t0")
        _check_png(p)

    def test_plot_error(self, tmp_path, traj):
        p = tmp_path / "e.png"
        plotting.plot_error(traj["tt"], np.abs(traj["ek_t"]) + 1e-6, str(p))
        _check_png(p)

    def test_plot_avg_spectrum(self, tmp_path, traj):
        p = tmp_path / "s.png"
        plotting.plot_avg_spectrum([traj["ek_ktt"][-1] + 1e-12], ["dns"], str(p))
        _check_png(p)

    def test_make_plot_three_rows(self, tmp_path, traj, monkeypatch, rng):
        monkeypatch.chdir(tmp_path)
        dns = dict(traj)
        coarse = dict(traj)
        coarse["x"] = traj["x"][::2]
        coarse["uu"] = traj["uu"][:, ::2]
        coarse["ek_ktt"] = traj["ek_ktt"][:, ::2]
        coarse["action_fields"] = rng.standard_normal((20, 16))
        del coarse["sgs_terms"]
        plotting.make_plot(dns, coarse, coarse, "cmp", True)
        _check_png(tmp_path / "cmp_evolution.png")

    def test_make_diffusion_plot(self, tmp_path, traj):
        p = tmp_path / "d.png"
        plotting.make_diffusion_plot(traj["x"], traj["tt"], traj["uu"],
                                     traj["uu"] * 0.99, str(p))
        _check_png(p)

    def test_plot_action_field(self, tmp_path, traj):
        p = tmp_path / "a.png"
        plotting.plot_action_field(traj["x"], traj["sgs_terms"], str(p))
        _check_png(p)

    def test_plot_training_curves(self, tmp_path):
        h = dict(experiences=[100, 200, 300], mean_return=[-1.0, -0.5, -0.2],
                 mean_ep_len=[10, 12, 15],
                 metrics=[{}, {"beta": 0.3}, {"beta": 0.4}])
        p = tmp_path / "t.png"
        plotting.plot_training_curves(h, str(p))
        _check_png(p)

    def test_rlview_cli(self, tmp_path, capsys):
        import json
        from marlpde_tpu.analysis import rlview
        d = tmp_path / "_result_x"
        d.mkdir()
        with open(d / "history.json", "w") as f:
            json.dump(dict(experiences=[1, 2], mean_return=[-1, 0],
                           mean_ep_len=[1, 2], gen=[1, 2],
                           metrics=[{}, {}]), f)
        rlview.main(["--dir", str(d)])
        out = capsys.readouterr().out
        assert "best_return" in out
        rlview.main(["--dir", str(d), "--out", str(tmp_path / "rv.png")])
        _check_png(tmp_path / "rv.png")


class TestMovies:
    """makeMovieField / makeMovieSpectrum equivalents (plotting.py:35-104)."""

    def test_make_movie_field(self, tmp_path):
        from marlpde_tpu.analysis import plotting
        x1 = np.linspace(0, 2 * np.pi, 32, endpoint=False)
        x2 = np.linspace(0, 2 * np.pi, 16, endpoint=False)
        tt = np.linspace(0, 1, 11)
        uu1 = np.sin(x1)[None] * np.cos(tt)[:, None]
        uu2 = np.sin(x2)[None] * np.cos(tt)[:, None]
        f = plotting.make_movie_field([x1, x2], [uu1, uu2], tt,
                                      fname=str(tmp_path / "evo.gif"),
                                      num_frames=4)
        with open(f, "rb") as fh:
            assert fh.read(6) in (b"GIF87a", b"GIF89a")

    def test_make_movie_spectrum(self, tmp_path):
        from marlpde_tpu.analysis import plotting
        N1, N2, T = 32, 16, 6
        k1 = np.fft.fftfreq(N1, 1.0 / N1)
        k2 = np.fft.fftfreq(N2, 1.0 / N2)
        rng = np.random.default_rng(0)
        ek1 = rng.uniform(1e-6, 0.5, (T, N1))
        ek2 = rng.uniform(1e-6, 0.5, (T, N2))
        f = plotting.make_movie_spectrum([k1, k2], [ek1, ek2],
                                         np.linspace(0, 1, T),
                                         fname=str(tmp_path / "spec.gif"),
                                         num_frames=3)
        with open(f, "rb") as fh:
            assert fh.read(6) in (b"GIF87a", b"GIF89a")


class TestEpisodeDumpPlots:
    """plotEpisode.py parity over --save-episodes dumps (plotEpisode.py:24-52)."""

    def test_plot_episode_dumps(self, tmp_path, rng):
        from marlpde_tpu.analysis import plotting
        for g in (1, 2):
            np.savez_compressed(
                tmp_path / f"episodes_gen{g}.npz",
                actions=rng.standard_normal((3, 5, 2, 4)),
                rewards=rng.standard_normal((3, 5, 2)),
                obs=rng.standard_normal((3, 5, 2, 6)),
                cumreward=rng.standard_normal((3, 2)))
        fq, fk = plotting.plot_episode_dumps(
            str(tmp_path / "episodes_gen*.npz"),
            out_prefix=str(tmp_path / "ep"))
        import os
        assert os.path.getsize(fq) > 0 and os.path.getsize(fk) > 0

    def test_missing_glob_raises(self, tmp_path):
        from marlpde_tpu.analysis import plotting
        import pytest as _pytest
        with _pytest.raises(FileNotFoundError):
            plotting.plot_episode_dumps(str(tmp_path / "nope*.npz"))
