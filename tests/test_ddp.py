"""DDP supervised-closure subproject tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlpde_tpu.ddp import pipeline


class TestFiltering:
    def test_filter_bar_matches_reference(self, rng):
        # ddp/helpers.py:6-12 literal re-derivation
        N, n_sub = 64, 16
        u = rng.standard_normal(N)
        v = np.fft.fft(u)
        vbar = np.concatenate((v[:(n_sub + 1) // 2], v[-(n_sub - 1) // 2:]))
        want = np.real(np.fft.ifft(vbar)) * n_sub / N
        got = np.asarray(pipeline.filter_bar(jnp.asarray(u), n_sub))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_calc_bar_matches_reference(self, rng):
        # ddp/helpers.py:15-29
        N, n_sub, L = 64, 16, 100.0
        U = rng.standard_normal(N)
        F = rng.standard_normal(N)
        u_bar, pi, f_bar = pipeline.calc_bar(jnp.asarray(U), jnp.asarray(F),
                                             n_sub, L)

        def fb(u):
            v = np.fft.fft(u)
            vb = np.concatenate((v[:(n_sub + 1) // 2], v[-(n_sub - 1) // 2:]))
            return np.real(np.fft.ifft(vb)) * n_sub / N

        tau = 0.5 * (fb(U * U) - fb(U) ** 2)
        want_pi = (tau - np.roll(tau, 1)) / (L / n_sub)
        np.testing.assert_allclose(np.asarray(pi), want_pi, atol=1e-12)
        np.testing.assert_allclose(np.asarray(u_bar), fb(U), atol=1e-12)

    def test_shift_augment_is_paired_periodic_shift(self, rng):
        a = jnp.asarray(rng.standard_normal((4, 8)))
        b = jnp.asarray(rng.standard_normal((4, 8)))
        a2, b2 = pipeline.shift_augment(jax.random.key(0), a, b)
        # each row is a rotation of the original, same shift for both arrays
        for i in range(4):
            row = np.asarray(a2[i])
            found = False
            for s in range(8):
                if np.allclose(row, np.roll(np.asarray(a[i]), -s)):
                    np.testing.assert_allclose(np.asarray(b2[i]),
                                               np.roll(np.asarray(b[i]), -s))
                    found = True
            assert found


class TestDnsGeneration:
    def test_generates_finite_trajectory(self):
        cfg = pipeline.DdpConfig(N=128, n_les=32)
        U, F = pipeline.generate_dns(cfg, 200, jax.random.key(0))
        assert U.shape == (201, 128)
        assert np.isfinite(np.asarray(U)).all()
        # forcing is piecewise-constant over s=20-step blocks
        f = np.asarray(F)
        assert np.allclose(f[1], f[20]) and not np.allclose(f[20], f[21])


class TestClosureTraining:
    def test_learns_identity_like_map(self, rng):
        # trivially learnable target: PI = 0.1 * u_bar
        x = rng.standard_normal((512, 16)).astype(np.float32)
        y = 0.1 * x
        model = pipeline.train_closure(jnp.asarray(x), jnp.asarray(y),
                                       jax.random.key(0), epochs=40,
                                       batch_size=128,
                                       net=pipeline.ClosureNet(n_out=16, width=32,
                                                               n_hidden=2))
        pred = np.asarray(model.predict(jnp.asarray(x[:10])))
        mse = np.mean((pred - y[:10]) ** 2)
        assert mse < 0.05 * np.var(y)

    def test_transfer_mask_reference_semantics(self, rng):
        """Freeze-first-6 retrain-rest (Transfer_Learning.py:93-102): on the
        full 8-Dense net, Dense_0..Dense_5 frozen, Dense_6 + Dense_7 retrain."""
        x = rng.standard_normal((64, 8)).astype(np.float32)
        net = pipeline.ClosureNet(n_out=8, width=12, n_hidden=6)  # 8 Dense
        m1 = pipeline.train_closure(jnp.asarray(x), jnp.asarray(0.5 * x),
                                    jax.random.key(0), epochs=2, batch_size=32,
                                    net=net)
        mask = pipeline.transfer_mask(m1.params)
        flags = {lay: bool(jax.tree.leaves(mask["params"][lay])[0])
                 for lay in mask["params"]}
        assert flags == {f"Dense_{i}": (i >= 6) for i in range(8)}
        m2 = pipeline.train_closure(jnp.asarray(x), jnp.asarray(-0.5 * x),
                                    jax.random.key(1), epochs=2, batch_size=32,
                                    net=net, params=m1.params,
                                    trainable_mask=mask)
        for i in range(8):
            a = np.asarray(m1.params["params"][f"Dense_{i}"]["kernel"])
            b = np.asarray(m2.params["params"][f"Dense_{i}"]["kernel"])
            if i < 6:
                np.testing.assert_array_equal(a, b)
            else:
                assert np.abs(a - b).max() > 0

    def test_transfer_learning_freezes_trunk(self, rng):
        x = rng.standard_normal((128, 8)).astype(np.float32)
        y = 0.5 * x
        net = pipeline.ClosureNet(n_out=8, width=16, n_hidden=2)
        m1 = pipeline.train_closure(jnp.asarray(x), jnp.asarray(y),
                                    jax.random.key(0), epochs=5, batch_size=64,
                                    net=net)
        mask = pipeline.head_only_mask(m1.params)
        m2 = pipeline.train_closure(jnp.asarray(x), jnp.asarray(-0.5 * x),
                                    jax.random.key(1), epochs=5, batch_size=64,
                                    net=net, params=m1.params,
                                    trainable_mask=mask)
        # trunk layers unchanged, head changed
        layers = sorted(m1.params["params"].keys())
        for lay in layers[:-1]:
            for k in m1.params["params"][lay]:
                np.testing.assert_array_equal(
                    np.asarray(m1.params["params"][lay][k]),
                    np.asarray(m2.params["params"][lay][k]))
        head = layers[-1]
        assert not np.allclose(np.asarray(m1.params["params"][head]["kernel"]),
                               np.asarray(m2.params["params"][head]["kernel"]))


class TestAposteriori:
    def test_rollout_shapes_and_stability(self, rng):
        cfg = pipeline.DdpConfig(N=128, n_les=32)
        n = cfg.n_les
        net = pipeline.ClosureNet(n_out=n, width=16, n_hidden=1)
        params = net.init(jax.random.key(0), jnp.zeros((1, n)))
        # zero-ish closure: scale outputs to ~0
        model = pipeline.ClosureModel(params=params, mean_in=0.0, std_in=1.0,
                                      mean_out=0.0, std_out=1e-6, net=net)
        x = np.linspace(0, cfg.L, n, endpoint=False)
        u0 = jnp.asarray(np.sin(2 * np.pi * 2 * x / cfg.L), jnp.float32)
        fseq = jnp.zeros((50, n), jnp.float32)
        uu = pipeline.aposteriori_rollout(model, cfg, u0, u0, fseq, 50)
        assert uu.shape == (51, n)
        assert np.isfinite(np.asarray(uu)).all()
        # bounded: the under-resolved shock Gibbs-overshoots (and piles up
        # aliased energy — the very effect the closure exists to fix), but
        # viscosity keeps the trajectory O(1)
        assert np.abs(np.asarray(uu)).max() < 3.0

    def test_resolved_rollout_dissipates_energy(self):
        # on a resolved grid the no-model LES is just viscous Burgers: decay
        cfg = pipeline.DdpConfig(N=128, n_les=128)
        n = cfg.n_les
        net = pipeline.ClosureNet(n_out=n, width=8, n_hidden=1)
        params = net.init(jax.random.key(0), jnp.zeros((1, n)))
        model = pipeline.ClosureModel(params=params, mean_in=0.0, std_in=1.0,
                                      mean_out=0.0, std_out=1e-8, net=net)
        # small-amplitude field like the filtered steady-state DNS the
        # reference predicts from (LES dt = s*dt = 0.2 is CFL-marginal at
        # amplitude 1)
        x = np.linspace(0, cfg.L, n, endpoint=False)
        u0 = jnp.asarray(0.1 * np.sin(2 * np.pi * 2 * x / cfg.L), jnp.float32)
        fseq = jnp.zeros((50, n), jnp.float32)
        uu = pipeline.aposteriori_rollout(model, cfg, u0, u0, fseq, 50)
        assert (np.asarray(uu[-1]) ** 2).sum() < (np.asarray(uu[0]) ** 2).sum()


class TestPipelineScale:
    """Reference-scale DDP pipeline (VERDICT r1 item 9): N=1024 stochastic
    DNS -> spectral filter to n_les=128 -> ANN closure training -> a-priori
    correlation against the true PI beats the static-Smagorinsky baseline
    (ddp/DSMAG.py role) -> stable a-posteriori ABCN+AB2 rollout."""

    def test_end_to_end_n1024(self):
        from marlpde_tpu.solvers import closures
        cfg = pipeline.DdpConfig()          # N=1024, n_les=128, s=20
        key = jax.random.key(7)
        n_dns = 4000
        U, F = pipeline.generate_dns(cfg, n_dns, key)
        assert U.shape == (n_dns + 1, 1024)
        assert bool(jnp.isfinite(U).all())
        # LES-rate frames (every s-th DNS step); the first ~200 frames are
        # the nonlinearly active era where the SGS term carries signal (the
        # reference trains on a 1e6-step statistically steady run — out of
        # test budget — so train/test on the active era of a short run)
        Us, Fs = U[::cfg.s], F[::cfg.s]
        u_bar, pi, f_bar = pipeline.calc_bar(Us, Fs, cfg.n_les, cfg.L)
        tr, te = slice(0, 150), slice(150, 200)
        model = pipeline.train_closure(u_bar[tr], pi[tr], jax.random.key(1),
                                       epochs=80, batch_size=64)
        ev = pipeline.apriori_eval(model, u_bar[te], pi[te])

        # static-Smagorinsky a-priori baseline on the same filtered fields
        dx = cfg.L / cfg.n_les
        smag = np.asarray(closures.ssm_forcing(
            jnp.asarray(u_bar[te]), dx, cfg.n_les))
        corr_smag = float(np.corrcoef(
            smag.ravel(), np.asarray(pi[te]).ravel())[0, 1])

        assert ev["correlation"] > 0.45, (ev, corr_smag)
        assert ev["correlation"] > abs(corr_smag), (ev, corr_smag)

        # a-posteriori: the ANN-closed LES stays finite and bounded over the
        # stored-forcing horizon.  (This short-data ANN destabilizes on
        # longer/vigorous-era horizons — the known a-posteriori fragility
        # the DDP paper's DSMAG blending addresses; TestAposteriori covers
        # the 50-step stability of the rollout harness itself.)
        start = 190
        n_roll = len(f_bar) - start - 1
        uu = pipeline.aposteriori_rollout(
            model, cfg, jnp.asarray(u_bar[start]),
            jnp.asarray(u_bar[start - 1]),
            jnp.asarray(f_bar[start:]), n_roll)
        assert uu.shape == (n_roll + 1, 128)
        assert bool(jnp.isfinite(uu).all())
        assert float(jnp.abs(uu).max()) < 50.0
