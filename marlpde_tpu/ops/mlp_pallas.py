"""Fused Pallas forward kernel for the VRACER policy MLP.

The acting path evaluates the 2-hidden-layer tanh MLP on B*num_agents rows
(131k rows in the flagship config).  In XLA each Dense writes its (R, 128)
activation to HBM (~270MB round-trip per call) — pure bandwidth waste.  This
kernel keeps all activations VMEM-resident: HBM traffic is obs in + heads out.

Layout: everything transposed so the row dimension R is the 128-aligned lane
axis — obs_T (obs_dim, R), weights stored as W^T (out, in), activations
(width, R_tile).  Heads: value (1,), policy mean (A,), sigma raw (A,), with
sigma = softplus(raw) * scale + floor applied in-kernel.

Parity with networks.VracerNet.apply is tested in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(sigma_scale, sigma_floor,
            obs_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            wv_ref, bv_ref, wm_ref, bm_ref, ws_ref, bs_ref,
            v_ref, mu_ref, sigma_ref):
    obs = obs_ref[:]                       # (obs_dim, R)
    h = jnp.tanh(jnp.dot(w1_ref[:], obs, preferred_element_type=jnp.float32)
                 + b1_ref[:])              # (W, R)
    h = jnp.tanh(jnp.dot(w2_ref[:], h, preferred_element_type=jnp.float32)
                 + b2_ref[:])              # (W, R)
    v_ref[:] = jnp.dot(wv_ref[:], h, preferred_element_type=jnp.float32) + bv_ref[:]
    mu_ref[:] = jnp.dot(wm_ref[:], h, preferred_element_type=jnp.float32) + bm_ref[:]
    raw = jnp.dot(ws_ref[:], h, preferred_element_type=jnp.float32) + bs_ref[:]
    sigma_ref[:] = jax.nn.softplus(raw) * sigma_scale + sigma_floor


@functools.partial(jax.jit, static_argnames=("init_noise", "sigma_floor", "tile_r"))
def mlp_forward(obs, params, *, init_noise: float, sigma_floor: float = 1e-5,
                tile_r: int = 2048):
    """obs (R, obs_dim) float32, params = flax VracerNet params (n_hidden=2).

    Returns (v (R,), mu (R, A), sigma (R, A)) matching VracerNet.__call__.
    """
    p = params["params"]
    layers = sorted(p.keys(), key=lambda s: int(s.split("_")[-1]))
    w1 = p[layers[0]]["kernel"]; b1 = p[layers[0]]["bias"]
    w2 = p[layers[1]]["kernel"]; b2 = p[layers[1]]["bias"]
    wv = p[layers[2]]["kernel"]; bv = p[layers[2]]["bias"]
    wm = p[layers[3]]["kernel"]; bm = p[layers[3]]["bias"]
    ws = p[layers[4]]["kernel"]; bs = p[layers[4]]["bias"]

    R, obs_dim = obs.shape
    W = w1.shape[1]
    A = wm.shape[1]
    pad = (-R) % tile_r
    obs_t = jnp.pad(obs, ((0, pad), (0, 0))).T          # (obs_dim, R+pad)
    Rp = R + pad
    sigma_scale = init_noise / float(np.log(2.0))

    grid = (Rp // tile_r,)
    row_spec = lambda d: pl.BlockSpec((d, tile_r), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)
    const = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, sigma_scale, sigma_floor)
    v_t, mu_t, sigma_t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[row_spec(obs_dim),
                  const(W, obs_dim), const(W, 1),
                  const(W, W), const(W, 1),
                  const(1, W), const(1, 1),
                  const(A, W), const(A, 1),
                  const(A, W), const(A, 1)],
        out_specs=[row_spec(1), row_spec(A), row_spec(A)],
        out_shape=[jax.ShapeDtypeStruct((1, Rp), jnp.float32),
                   jax.ShapeDtypeStruct((A, Rp), jnp.float32),
                   jax.ShapeDtypeStruct((A, Rp), jnp.float32)],
    )(obs_t, w1.T, b1[:, None], w2.T, b2[:, None],
      wv.T, bv[:, None], wm.T, bm[:, None], ws.T, bs[:, None])
    return (v_t[0, :R], mu_t[:, :R].T, sigma_t[:, :R].T)
