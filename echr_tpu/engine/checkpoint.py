"""Checkpoint / resume.

Capability parity with the reference's two artifacts (reference:
train.py:456-503): `model.pth` (model + both optimizer states + iteration)
and `info.pkl` (config, epoch/iteration, best score, **dataloader iterator
state and shuffled split order** for mid-epoch determinism, vocab, loss/lr
histories).  Stored as a pickle of numpy-converted pytrees plus a JSON
config sidecar; `model-best` kept separately.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

from echr_tpu.config import Config


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    state,
    cfg: Config,
    *,
    iteration: int,
    epoch: int,
    best_val_score: float,
    loader_state: Optional[Dict] = None,
    histories: Optional[Dict] = None,
    vocab: Optional[Dict] = None,
    extra: Optional[Dict] = None,
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "state": _to_numpy(state),
        "iteration": iteration,
        "epoch": epoch,
        "best_val_score": best_val_score,
        "loader_state": loader_state,
        "histories": histories or {},
        "vocab": vocab,
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    with open(path + ".config.json", "w") as f:
        f.write(cfg.to_json())


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    cfg_path = path + ".config.json"
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            payload["config"] = Config.from_json(f.read())
    return payload


# ---------------------------------------------------------------------------
# orbax backend (optional): async-capable production checkpointing
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(directory: str, state, cfg: Config, *, iteration: int,
                          **meta) -> None:
    """Alternative orbax backend (sharded/async-capable).  The pickle
    backend above remains the default — it round-trips arbitrary optax
    states and is what resume/warm-start tests gate."""
    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    with ocp.StandardCheckpointer() as cp:
        cp.save(
            os.path.join(os.path.abspath(directory), f"step_{iteration}"),
            _to_numpy(state),
        )
    with open(os.path.join(directory, "config.json"), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump({"iteration": iteration, **{k: v for k, v in meta.items()
                                              if isinstance(v, (int, float, str))}}, f)


def load_checkpoint_orbax(directory: str, iteration: int, target) -> Any:
    """Restore into a pytree shaped like `target` (e.g. a fresh TrainState)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as cp:
        return cp.restore(
            os.path.join(os.path.abspath(directory), f"step_{iteration}"),
            _to_numpy(target),
        )


def load_params_only(path: str, which: str = "tap_cg") -> Dict[str, Any]:
    """Warm-start weights only (reference pretrain semantics, train.py:183-194):
    which in {'tap', 'cg', 'tap_cg'}."""
    payload = load_checkpoint(path)
    state = payload["state"]
    out = {}
    if which in ("tap", "tap_cg"):
        out["tap_params"] = state.tap_params
    if which in ("cg", "tap_cg"):
        out["cg_params"] = state.cg_params
    return out
