"""Minimal op-level probe for the axon TPU backend's FFT support.

Round-3 KS runs (runs/ks_906.log, runs/bench_ks_r3.log) died with
`UNIMPLEMENTED: TPU backend error` surfacing at the first device->host
readback — i.e. an async-dispatched program failed server-side.  The KS path
is the only workload using `jnp.fft.rfft/irfft` inside jit (solvers/ks.py);
the working Burgers bench rides the DFT-matmul path (ops/dft.py).  This
probe isolates which op class the backend rejects.

Run:  python scripts/tpu_fft_probe.py   (TPU via axon; one process at a time)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def probe(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        # D2H readback is the only reliable completion barrier on axon
        val = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0].real)
        print(f"[probe] {name:40s} OK   ({val:.6g})", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:120]
        print(f"[probe] {name:40s} FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    print(f"[probe] devices={jax.devices()}", flush=True)
    x32 = jnp.asarray(np.random.default_rng(0).standard_normal((8, 32)),
                      jnp.float32)
    x1024 = jnp.asarray(np.random.default_rng(1).standard_normal((8, 1024)),
                        jnp.float32)

    probe("scalar add (sanity)", lambda a: a.sum(), x32)
    probe("complex on-device (lax.complex)",
          lambda a: jnp.real(jax.lax.complex(a, a) * 2.0).sum(), x32)
    probe("rfft N=32", lambda a: jnp.abs(jnp.fft.rfft(a, axis=-1)).sum(), x32)
    probe("irfft N=32",
          lambda a: jnp.fft.irfft(jnp.fft.rfft(a, axis=-1), 32, axis=-1).sum(),
          x32)
    probe("fft (complex) N=32",
          lambda a: jnp.real(jnp.fft.fft(a, axis=-1)).sum(), x32)
    probe("rfft N=1024",
          lambda a: jnp.abs(jnp.fft.rfft(a, axis=-1)).sum(), x1024)
    probe("fft N=1024",
          lambda a: jnp.real(jnp.fft.fft(a, axis=-1)).sum(), x1024)

    from marlpde_tpu.ops import dft
    probe("DFT-matmul N=32", lambda a: dft.dft(a)[0].sum(), x32)
    probe("DFT-matmul N=1024", lambda a: dft.dft(a)[0].sum(), x1024)

    # rfft-matmul equivalents (the planned KS fix)
    from marlpde_tpu.core import spectral
    probe("rfft_mm N=32", lambda a: jnp.abs(spectral.rfft_mm(a)).sum(), x32)
    probe("irfft_mm N=32",
          lambda a: spectral.irfft_mm(spectral.rfft_mm(a), 32).sum(), x32)

    # KS-rollout specifics
    from marlpde_tpu.solvers import ks
    probe("full_spectrum (conj+reverse+concat)",
          lambda a: jnp.real(ks.full_spectrum(
              jnp.fft.rfft(a, axis=-1), 32)).sum(), x32)
    for impl in ("fft", "dft"):
        kcfg = ks.KSConfig(N=32, fft_impl=impl)
        st0 = jax.jit(lambda u: ks.init(kcfg, u0=u))(0.1 * x32)
        probe(f"KS ETDRK4 step x3 jitted ({impl})",
              lambda s: jax.lax.scan(
                  lambda c, _: (ks.step(kcfg, c)[0], None), s, None,
                  length=3)[0].u.sum(), st0)

    # EAGER (non-jit) dispatch — the old on-device pool build's mode
    try:
        y = jnp.fft.rfft(x32, axis=-1)          # eager op
        val = float(np.abs(np.asarray(y)).sum())
        print(f"[probe] eager rfft N=32                        OK   ({val:.6g})",
              flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:120]
        print(f"[probe] eager rfft N=32                        FAIL "
              f"{type(e).__name__}: {msg}", flush=True)

    # the fixed KS env path end-to-end: host-built pool, jitted reset+steps
    try:
        from marlpde_tpu.envs import ks_env
        cfg = ks_env.KSEnvConfig()       # reference defaults, resolves to dft
        pool = ks_env.make_dns_pool(cfg, 1)
        st, obs = jax.jit(lambda p, k: ks_env.reset(cfg, p, k, jnp.asarray(0)))(
            pool, jax.random.key(0))
        a = jnp.zeros((1, 32), jnp.float32)
        stepf = jax.jit(lambda p, s, a_: ks_env.step(cfg, p, s, a_))
        for _ in range(3):
            st, obs, rew, done, _aux = stepf(pool, st, a)
        print(f"[probe] KS env host-pool + jitted steps        OK   "
              f"(rew={float(np.asarray(rew).sum()):.6g}, "
              f"max|u|={float(np.abs(np.asarray(st.solver.u)).max()):.4g})",
              flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"[probe] KS env host-pool + jitted steps        FAIL "
              f"{type(e).__name__}: {msg}", flush=True)

    print("[probe] done", flush=True)


if __name__ == "__main__":
    sys.exit(main())
