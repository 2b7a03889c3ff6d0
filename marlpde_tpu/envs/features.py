"""State featurization for the closure environments.

Parity target: Burger.getState (Burger.py:604-675) / Burger_fd.getState.

Versions (Burger.py:617-626):
  0: d2udx2            1: [dudt, d2udx2]       2: [u, u^2]
  3: d2udx2 + lower-half energy spectrum       4: u + lower-half energy spectrum

Single agent returns the flattened feature stack; multi-agent returns per-agent
halo slices: indices a-1 .. b (wrapped), a = i*N/na, b = (i+1)*N/na
(Burger.py:656-674).  All outputs have shape (num_agents, obs_dim) — the
single-agent case is num_agents=1 — so the policy vmap is uniform.

The derivative convention replicates the reference exactly:
  up = roll(u, 1), um = roll(u, -1), d2udx2 = (up - 2u + um)/dx^2,
  dudt = (u - u_prev)/dt with u_prev the previous *solver* step's field.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def halo_indices(N: int, num_agents: int) -> np.ndarray:
    """(num_agents, N//num_agents + 2) wrapped gather indices (Burger.py:658-660)."""
    per = N // num_agents
    idx = np.stack([np.arange(i * per - 1, (i + 1) * per + 1) % N
                    for i in range(num_agents)])
    return idx


def obs_dim(version: int, N: int, num_agents: int) -> int:
    """Observation length per agent; mirrors run-vracer-burger.py:136-146."""
    if num_agents == 1:
        base = {0: N, 1: 2 * N, 2: 2 * N, 3: N, 4: N}[version]
        return base + (N // 2 if version in (3, 4) else 0)
    per = N // num_agents + 2
    base = {0: per, 1: 2 * per, 2: 2 * per, 3: per, 4: per}[version]
    return base + (N // 2 if version in (3, 4) else 0)


def burger_features(version: int, num_agents: int, u, u_prev, v, dt, dx):
    """(..., num_agents, obs_dim) observation tensor.

    u, u_prev: (..., N) fields; v: (..., N) spectrum (versions 3/4 only).
    """
    N = u.shape[-1]
    up = jnp.roll(u, 1, -1)
    um = jnp.roll(u, -1, -1)
    d2udx2 = (up - 2.0 * u + um) / dx**2
    dudt = (u - u_prev) / dt

    if version in (0, 3):
        feats = (d2udx2,)
    elif version == 1:
        feats = (dudt, d2udx2)
    elif version == 2:
        feats = (u, u * u)
    elif version == 4:
        feats = (u,)
    else:
        raise ValueError(f"[features] unknown version {version}")

    if version in (3, 4):
        ek = 0.5 * jnp.real(jnp.conj(v) * v) / N * dx
        ek_half = ek[..., : N // 2]

    if num_agents == 1:
        obs = jnp.concatenate(feats, axis=-1)
        if version in (3, 4):
            obs = jnp.concatenate([obs, ek_half], axis=-1)
        return obs[..., None, :]

    idx = jnp.asarray(halo_indices(N, num_agents))          # (na, per+2)
    sliced = [f[..., idx] for f in feats]                    # (..., na, per+2)
    obs = jnp.concatenate(sliced, axis=-1)                   # feature-major, as the
    # reference's state[:, index].flatten() — row-major over (feature, index)
    if version in (3, 4):
        ek_b = jnp.broadcast_to(ek_half[..., None, :],
                                ek_half.shape[:-1] + (num_agents, N // 2))
        obs = jnp.concatenate([obs, ek_b], axis=-1)
    return obs


def agent_block_mean(x, num_agents: int):
    """Per-agent means over contiguous blocks (Burger.py:595-599): (..., na)."""
    N = x.shape[-1]
    xb = x.reshape(x.shape[:-1] + (num_agents, N // num_agents))
    return xb.mean(axis=-1)
