"""Checkpoint/resume: the korali e.loadState / File Output equivalent
(run-vracer-burger.py:59-62,196-201).

A complete checkpoint restores training EXACTLY where it stopped — the korali
semantics of `e.loadState(dir+'/latest')` with `Experience Replay
Serialize=True` (run-vracer-burger.py:59-62,196).  Pieces:

  * train state  — params, optimizer, REFER beta, normalizer stats, update
                   counter (latest.pkl, or an orbax directory)
  * history      — per-generation curves (history.json)
  * meta         — the trainer RNG key and the gen / experiences / episode
                   counters (meta.npz); restoring these makes a killed-and-
                   resumed run bitwise-identical to an uninterrupted one
  * replay       — the episode ring buffer (replay.npz), opt-in like korali's
                   "Experience Replay Serialize" because it is large

Backends: "pickle" (default — plain pickle + npz, robust for arbitrary
pytrees incl. optax states) or "orbax" (orbax.checkpoint PyTreeCheckpointer,
the multi-host-capable production path; restore needs `rl_cfg` to rebuild the
pytree template).  Select per-call or via MARLPDE_CKPT_BACKEND.
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
from typing import Optional

import jax
import numpy as np


def _backend(backend: Optional[str]) -> str:
    return backend or os.environ.get("MARLPDE_CKPT_BACKEND", "pickle")


def _to_numpy(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_train_state(path: str, ts, history: Optional[dict] = None,
                     backend: Optional[str] = None):
    os.makedirs(path, exist_ok=True)
    if _backend(backend) == "orbax":
        import orbax.checkpoint as ocp
        d = os.path.abspath(os.path.join(path, "latest_orbax"))
        tmp = d + ".tmp"
        # Multi-process protocol: EVERY process must call ocp save (it
        # synchronizes internally via jax.distributed barriers); only the
        # primary touches the filesystem around it.  orbax's save_start
        # barrier orders the primary's rmtree before any writes.
        primary = jax.process_index() == 0
        if primary:
            shutil.rmtree(tmp, ignore_errors=True)
        ocp.PyTreeCheckpointer().save(tmp, _to_numpy(ts))
        if primary:
            shutil.rmtree(d, ignore_errors=True)
            os.replace(tmp, d)
    else:
        with open(os.path.join(path, "latest.pkl"), "wb") as f:
            pickle.dump(_to_numpy(ts), f)
    if history is not None:
        with open(os.path.join(path, "history.json"), "w") as f:
            json.dump(history, f)


def load_train_state(path: str, rl_cfg=None, backend: Optional[str] = None):
    """Returns the restored TrainState or None if absent.  The orbax backend
    needs ``rl_cfg`` to rebuild the pytree template it restores into."""
    odir = os.path.join(path, "latest_orbax")
    if _backend(backend) == "orbax" and os.path.isdir(odir):
        import orbax.checkpoint as ocp
        from marlpde_tpu.rl import vracer
        template = _to_numpy(vracer.init_train(rl_cfg, jax.random.key(0)))
        ts = ocp.PyTreeCheckpointer().restore(os.path.abspath(odir),
                                              item=template)
        return jax.tree.map(lambda a: jax.numpy.asarray(a), ts)
    fname = os.path.join(path, "latest.pkl")
    if not os.path.exists(fname):
        return None
    with open(fname, "rb") as f:
        ts = pickle.load(f)
    return jax.tree.map(lambda a: jax.numpy.asarray(a), ts)


def load_history(path: str) -> Optional[dict]:
    fname = os.path.join(path, "history.json")
    if not os.path.exists(fname):
        return None
    with open(fname) as f:
        return json.load(f)


def save_meta(path: str, key, gen: int, total_exp: float, episode_base: int,
              real_in_replay: Optional[int] = None, rl_cfg=None):
    """Trainer RNG key + counters — what korali folds into its state file so a
    resumed run continues the exact same stream (run-vracer-burger.py:59-62).

    ``real_in_replay`` is the cumulative live-experience insert count (korali's
    _experienceCount) — without it, a resumed --realexp experience-mode run
    restarts the korali update ledger from 0 and takes no gradient updates
    until it re-collects replay_start + past-updates*expperu NEW experiences
    (ADVICE r3, high).

    ``rl_cfg`` adds a config fingerprint (mu_param, cutoff_dim_norm): the
    param tree is deliberately shape-identical across mu_param modes, so
    without the fingerprint a --resume could silently load an absolute-mode
    mean head into a sigma_relative net — scaling the restored policy mean by
    stop_grad(sigma) with no error (ADVICE r4, medium).  check_fingerprint
    enforces it at restore time."""
    os.makedirs(path, exist_ok=True)
    extra = {}
    if real_in_replay is not None:
        extra["real_in_replay"] = np.int64(real_in_replay)
    if rl_cfg is not None:
        extra["mu_param"] = np.str_(rl_cfg.mu_param)
        extra["cutoff_dim_norm"] = np.bool_(rl_cfg.cutoff_dim_norm)
    np.savez(os.path.join(path, "meta.npz"),
             key=np.asarray(jax.random.key_data(key)),
             gen=np.int64(gen), total_exp=np.float64(total_exp),
             episode_base=np.int64(episode_base), **extra)


def load_meta(path: str) -> Optional[dict]:
    fname = os.path.join(path, "meta.npz")
    if not os.path.exists(fname):
        return None
    d = np.load(fname)
    meta = dict(key=jax.random.wrap_key_data(jax.numpy.asarray(d["key"])),
                gen=int(d["gen"]), total_exp=float(d["total_exp"]),
                episode_base=int(d["episode_base"]))
    if "real_in_replay" in d:
        meta["real_in_replay"] = int(d["real_in_replay"])
    if "mu_param" in d:
        meta["mu_param"] = str(d["mu_param"])
        meta["cutoff_dim_norm"] = bool(d["cutoff_dim_norm"])
    return meta


def check_fingerprint(path: str, rl_cfg, what: str = "resume"):
    """Refuse to marry a checkpoint to a mismatched learner config (see
    save_meta docstring).  Pre-fingerprint checkpoints only get a warning —
    erroring would strand every round-3 artifact."""
    meta = load_meta(path)
    if meta is None or "mu_param" not in meta:
        print(f"[checkpoint] WARNING: {path} has no config fingerprint; "
              f"cannot verify mu_param/cutoff_dim_norm match for {what} "
              f"(pre-round-5 checkpoint?)")
        return
    for field in ("mu_param", "cutoff_dim_norm"):
        saved, now = meta[field], getattr(rl_cfg, field)
        if saved != now:
            raise SystemExit(
                f"[checkpoint] {what}: saved {field}={saved!r} but the "
                f"current config has {field}={now!r}.  Loading across modes "
                f"silently rescales the policy mean; pass --muparam/--dimnorm "
                f"matching the original run (see docs/REFER_SCALE.md).")


def _replay_fields(rep):
    import dataclasses
    return [f.name for f in dataclasses.fields(rep)]


def save_replay(path: str, rep):
    """Works for both replay layouts (episode-slot Replay and the flat
    experience FlatReplay) — fields are introspected from the dataclass."""
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(os.path.join(path, "replay.npz"),
                        **{k: np.asarray(getattr(rep, k))
                           for k in _replay_fields(rep)})


def load_replay(path: str, template):
    fname = os.path.join(path, "replay.npz")
    if not os.path.exists(fname):
        return None
    data = np.load(fname)
    return template.replace(**{k: jax.numpy.asarray(data[k])
                               for k in _replay_fields(template)})
