"""VRACER network: one MLP trunk emitting V(s), policy mean, and policy stddev.

Parity target: the korali function approximator configured by the drivers —
2 hidden Linear(width) + Tanh layers on OneDNN, Adam (run-vracer-burger.py:175-190),
with a single network for value + policy (that is what makes it V-RACER).

sigma is parameterized as softplus(raw) scaled so that raw=0 gives the
driver's "Initial Exploration Noise" (run-vracer-burger.py:158).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class VracerNet(nn.Module):
    act_dim: int
    width: int = 128
    n_hidden: int = 2
    init_noise: float = 0.1       # initial sigma (iex)
    sigma_floor: float = 1e-5
    # Exploration-sigma ceiling.  korali leaves sigma unbounded; in long
    # spectral-reward runs the policy gradient can inflate sigma without
    # limit (observed: 0.2 -> 5.9 over 1e5 updates, degrading collection
    # while the deterministic policy stays good).  Beyond the action RANGE a
    # clipped-normal is effectively a bound-sampler anyway, so capping there
    # loses nothing.  inf = korali-faithful unbounded (default).
    sigma_max: float = np.inf

    @nn.compact
    def __call__(self, obs):
        h = obs
        for _ in range(self.n_hidden):
            h = nn.tanh(nn.Dense(self.width)(h))
        v = nn.Dense(1)(h)[..., 0]
        mu = nn.Dense(self.act_dim)(h)
        raw = nn.Dense(self.act_dim, kernel_init=nn.initializers.zeros)(h)
        # softplus(0) = log 2, so raw=0 yields sigma = init_noise exactly
        sigma = nn.softplus(raw) * (self.init_noise / float(np.log(2.0))) + self.sigma_floor
        if np.isfinite(self.sigma_max):
            # hard ceiling: exact identity below the cap (a tanh cap would
            # distort sigma everywhere — iex=3 under cap 5 would start at
            # 2.68), zero gradient above it (the upward ratchet just stops)
            sigma = jnp.minimum(sigma, self.sigma_max)
        return v, mu, sigma
