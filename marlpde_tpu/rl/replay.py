"""On-device episode replay buffer (REFER storage layer).

korali's replay (run-vracer-burger.py:166-167) holds 20k-100k *experiences*;
V-RACER's value targets are computed along stored episodes, so the TPU-native
layout stores whole fixed-length episodes:

  obs      (C, T, na, obs_dim)
  actions  (C, T, na, act_dim)
  mu/sigma (C, T, na, act_dim)   behavior-policy params at sample time
  rewards  (C, T, na)
  mask     (C, T)                1 while the episode was live
  final_obs (C, na, obs_dim)     observation after the last executed step
  truncated (C,)                 True if the episode ended by numeric blowup
                                 ("Truncated" in the reference,
                                 burger_environment.py:201 — the learner then
                                 bootstraps value targets from V(final_obs))
  vtg      (C, T, na)            stored retrace (V-trace) value estimates, used
                                 by the korali-style uniform-experience
                                 minibatch mode (vracer minibatch_mode=
                                 "experience"); computed at insertion and
                                 lazily refreshed when sampled, exactly
                                 korali's "Retrace Value" bookkeeping
  boot     (C, na)               stored V(s_T) bootstrap for truncated
                                 episodes (korali "Truncated State Value"),
                                 zero for terminal ones
  filled   ()                    number of valid episode slots
  cursor   ()                    ring-buffer write head

Capacity C is in episodes (max_experiences // T).  Insertion overwrites the
oldest episode (korali's replay is FIFO over experiences, same effect).
All ops are jit-safe (static shapes, dynamic_update_slice writes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class Replay(struct.PyTreeNode):
    obs: jax.Array
    actions: jax.Array
    mu: jax.Array
    sigma: jax.Array
    rewards: jax.Array
    mask: jax.Array
    final_obs: jax.Array
    truncated: jax.Array
    vtg: jax.Array
    boot: jax.Array
    filled: jax.Array     # int32
    cursor: jax.Array     # int32

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]


def init(capacity: int, T: int, na: int, obs_dim: int, act_dim: int,
         dtype=jnp.float32) -> Replay:
    return Replay(
        obs=jnp.zeros((capacity, T, na, obs_dim), dtype),
        actions=jnp.zeros((capacity, T, na, act_dim), dtype),
        mu=jnp.zeros((capacity, T, na, act_dim), dtype),
        sigma=jnp.ones((capacity, T, na, act_dim), dtype),
        rewards=jnp.zeros((capacity, T, na), dtype),
        mask=jnp.zeros((capacity, T), dtype),
        final_obs=jnp.zeros((capacity, na, obs_dim), dtype),
        truncated=jnp.zeros((capacity,), bool),
        vtg=jnp.zeros((capacity, T, na), dtype),
        boot=jnp.zeros((capacity, na), dtype),
        filled=jnp.zeros((), jnp.int32),
        cursor=jnp.zeros((), jnp.int32))


def add_episodes(rep: Replay, batch: dict) -> Replay:
    """Insert a batch of B episodes (leading axis B, time axis T)."""
    B = batch["obs"].shape[0]
    C = rep.capacity
    idx = (rep.cursor + jnp.arange(B)) % C

    def put(buf, new):
        return buf.at[idx].set(new.astype(buf.dtype))

    return rep.replace(
        obs=put(rep.obs, batch["obs"]),
        actions=put(rep.actions, batch["actions"]),
        mu=put(rep.mu, batch["mu"]),
        sigma=put(rep.sigma, batch["sigma"]),
        rewards=put(rep.rewards, batch["rewards"]),
        mask=put(rep.mask, batch["mask"]),
        final_obs=put(rep.final_obs, batch["final_obs"]),
        truncated=rep.truncated.at[idx].set(batch["truncated"]),
        vtg=put(rep.vtg, batch["vtg"]) if "vtg" in batch
            else rep.vtg.at[idx].set(0.0),
        boot=put(rep.boot, batch["boot"]) if "boot" in batch
            else rep.boot.at[idx].set(0.0),
        filled=jnp.minimum(rep.filled + B, C),
        cursor=(rep.cursor + B) % C)


def sample_episodes(rep: Replay, key, n: int) -> dict:
    """Uniformly sample n episode slots among the filled ones."""
    idx = jax.random.randint(key, (n,), 0, jnp.maximum(rep.filled, 1))
    return dict(obs=rep.obs[idx], actions=rep.actions[idx], mu=rep.mu[idx],
                sigma=rep.sigma[idx], rewards=rep.rewards[idx],
                mask=rep.mask[idx], final_obs=rep.final_obs[idx],
                truncated=rep.truncated[idx])


def sample_experiences(rep: Replay, key, n: int) -> dict:
    """Uniformly sample n individual EXPERIENCES (korali Mini Batch Size=256
    semantics, run-vracer-burger.py:132): each valid (episode, t) pair is
    equally likely, including across truncated (shorter) episodes — drawn as a
    categorical over the flattened mask, so empty slots and post-termination
    steps have probability zero.

    Returns per-experience rows plus the stored next-step retrace values:
      obs/actions/mu/sigma (n, na, ...), rewards (n, na),
      vtg_next (n, na)  = stored vtg[ep, t+1], or boot[ep] at episode ends,
      ep, t (n,)        = indices for scatter_vtg write-back.

    Masks are prefix-contiguous (an episode is live from t=0 until its
    termination), so a uniform draw over valid slots is a uniform integer in
    [0, total_live) mapped through the per-episode length prefix sum — O(C+n)
    instead of the naive (n, C*T) gumbel-max categorical, which at korali
    replay sizes (2^20 experiences) moved ~1 GB of noise per 256-sample
    minibatch.
    """
    C, T = rep.mask.shape
    lengths = rep.mask.sum(axis=1).astype(jnp.int32)      # (C,)
    cum = jnp.cumsum(lengths)                             # (C,)
    u = jax.random.randint(key, (n,), 0, jnp.maximum(cum[-1], 1))
    ep = jnp.searchsorted(cum, u, side="right").astype(jnp.int32)
    t = u - jnp.where(ep > 0, cum[jnp.maximum(ep - 1, 0)], 0)
    t_next = jnp.minimum(t + 1, T - 1)
    has_next = (t + 1 < T) & (rep.mask[ep, t_next] > 0)
    vtg_next = jnp.where(has_next[:, None], rep.vtg[ep, t_next], rep.boot[ep])
    return dict(obs=rep.obs[ep, t], actions=rep.actions[ep, t],
                mu=rep.mu[ep, t], sigma=rep.sigma[ep, t],
                rewards=rep.rewards[ep, t], vtg_next=vtg_next,
                truncated=rep.truncated[ep], final_obs=rep.final_obs[ep],
                is_last=~has_next, ep=ep, t=t)


def scatter_vtg(rep: Replay, ep, t, new_vtg, new_boot=None) -> Replay:
    """Write back lazily-refreshed retrace values for sampled experiences
    (korali updateExperienceMetadata equivalent).  ``new_boot`` refreshes the
    truncated-state bootstrap V(s_T) for the touched episodes."""
    rep = rep.replace(vtg=rep.vtg.at[ep, t].set(new_vtg.astype(rep.vtg.dtype)))
    if new_boot is not None:
        rep = rep.replace(boot=rep.boot.at[ep].set(new_boot.astype(rep.boot.dtype)))
    return rep


def num_experiences(rep: Replay) -> jax.Array:
    return rep.filled * rep.obs.shape[1]
