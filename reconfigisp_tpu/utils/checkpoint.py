"""Checkpoint / resume for parameter pytrees and training state.

Re-design of reference codes/models/base_model.py:77-119 (save_network /
save_training_state / resume_training).  Unlike the reference — whose entry
points hardcode resume_state=None (train.py:81-82) — resume is wired into the
trainers.  Format: a pickle of numpy-ified pytrees plus metadata; filenames
follow the reference's {iter}_{label} convention.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


FORMAT_VERSION = 1
_MAGIC = "__reconfigisp_ckpt__"


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _wrap(payload: Any) -> dict:
    return {_MAGIC: FORMAT_VERSION, "payload": payload}


def _unwrap(obj: Any) -> Any:
    """Accept both versioned and legacy (bare-pytree) checkpoints."""
    if isinstance(obj, dict) and _MAGIC in obj:
        ver = obj[_MAGIC]
        if ver > FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format {ver} is newer than supported "
                f"({FORMAT_VERSION}) — upgrade the framework to load it")
        return obj["payload"]
    return obj


def save_network(path_dir: str, label: str, iter_label, variables) -> str:
    """-> <dir>/<iter>_<label>.ckpt (reference base_model.py:77-85)."""
    os.makedirs(path_dir, exist_ok=True)
    path = os.path.join(path_dir, f"{iter_label}_{label}.ckpt")
    with open(path, "wb") as f:
        pickle.dump(_wrap(_to_numpy(variables)), f)
    return path


def load_network(path: str):
    with open(path, "rb") as f:
        return _unwrap(pickle.load(f))


def save_training_state(path_dir: str, iter_label, *, epoch: int, step: int,
                        variables, opt_state, extra: Optional[dict] = None) -> str:
    """-> <dir>/<iter>.state (reference base_model.py:99-108)."""
    os.makedirs(path_dir, exist_ok=True)
    path = os.path.join(path_dir, f"{iter_label}.state")
    state = {
        "epoch": epoch,
        "step": step,
        "variables": _to_numpy(variables),
        "opt_state": _to_numpy(opt_state),
        "extra": _to_numpy(extra) if extra is not None else None,
    }
    with open(path, "wb") as f:
        pickle.dump(_wrap(state), f)
    return path


def load_training_state(path: str) -> dict:
    """Restore for resume (reference base_model.py:110-119 — wired here)."""
    with open(path, "rb") as f:
        return _unwrap(pickle.load(f))


def latest_state(path_dir: str) -> Optional[str]:
    """Most recent .state file by iteration number, if any."""
    if not os.path.isdir(path_dir):
        return None
    states = [f for f in os.listdir(path_dir) if f.endswith(".state")]
    if not states:
        return None
    states.sort(key=lambda f: int(f.split(".")[0]))
    return os.path.join(path_dir, states[-1])
