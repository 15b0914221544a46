"""Checkpoint / resume.

Capability parity with the reference's two artifacts (reference:
train.py:456-503): `model.pth` (model + both optimizer states + iteration)
and `info.pkl` (config, epoch/iteration, best score, **dataloader iterator
state and shuffled split order** for mid-epoch determinism, vocab, loss/lr
histories).  `model-best` kept separately.

Format v2 (the default since round 4, VERDICT r3 next-7): the pickle holds
ONLY plain dicts / lists / numpy arrays / primitives — the TrainState and
every optax namedtuple are flattened to field-name-keyed dicts via
flax.serialization, and the fully-resolved config JSON is embedded.  The
artifact therefore survives refactors (no class paths inside) and carries
its own schema version.  `load_checkpoint` rebuilds a live TrainState from
the dicts (optimizer-state *structure* comes from `make_optimizer(cfg)`,
every *value* from the file) and still reads v1 (raw-pytree pickle)
checkpoints for back-compat.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

from echr_tpu.config import Config

FORMAT_VERSION = 2


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _state_to_dict(state) -> Dict[str, Any]:
    """TrainState -> a plain-container tree.  The params pytrees are already
    dict/list/array-only, so they are stored VERBATIM (their list-vs-dict
    structure is the ground truth the rebuild needs); the optax states —
    the only class-bearing subtrees — are flattened to field-name-keyed
    dicts via flax.serialization, so no namedtuple class paths enter the
    pickle stream."""
    from flax import serialization

    state = _to_numpy(state)
    return {
        "tap_params": state.tap_params,
        "cg_params": state.cg_params,
        "tap_opt": serialization.to_state_dict(state.tap_opt),
        "cg_opt": serialization.to_state_dict(state.cg_opt),
        "step": state.step,
    }


def _state_from_dict(sd: Dict[str, Any], cfg: Config):
    """Rebuild a live TrainState from a v2 state dict.  The optimizer-state
    template comes from make_optimizer(cfg).init(params) — cheap (zero
    moments, no model init) and structured by the verbatim-stored params —
    then every optimizer leaf is overwritten from the file, so
    count/moments/injected LR all resume exactly."""
    from flax import serialization

    from echr_tpu.engine.steps import TrainState, make_optimizer

    tap_params, cg_params = sd["tap_params"], sd["cg_params"]
    tx = make_optimizer(cfg)
    return TrainState(
        tap_params=tap_params,
        cg_params=cg_params,
        tap_opt=_to_numpy(
            serialization.from_state_dict(tx.init(tap_params), sd["tap_opt"])),
        cg_opt=_to_numpy(
            serialization.from_state_dict(tx.init(cg_params), sd["cg_opt"])),
        step=np.asarray(sd["step"]),
    )


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
        "format_version": FORMAT_VERSION,
        "state": _state_to_dict(state),
        "config_json": cfg.to_json(),  # embedded: the artifact is self-contained
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


def load_checkpoint(path: str, *, rebuild_state: bool = True) -> Dict[str, Any]:
    """Read a checkpoint of any supported format_version (v1: raw-pytree
    pickle from rounds 1-3; v2: class-free dicts).  Returns the payload with
    `state` as a live TrainState (set rebuild_state=False to get the raw v2
    state dict, e.g. for params-only consumers)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    cfg_path = path + ".config.json"
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            payload["config"] = Config.from_json(f.read())
    elif payload.get("config_json"):
        payload["config"] = Config.from_json(payload["config_json"])
    version = payload.get("format_version", 1)
    if version > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint {path} has format_version {version} "
            f"(this build reads <= {FORMAT_VERSION})")
    if version >= 2 and rebuild_state:
        cfg = payload.get("config")
        if cfg is None and payload.get("config_json"):
            cfg = Config.from_json(payload["config_json"])
        if cfg is None:
            raise ValueError(
                f"v2 checkpoint {path} lacks both the embedded config_json "
                "and the .config.json sidecar; cannot rebuild the optimizer "
                "state structure")
        payload["state"] = _state_from_dict(payload["state"], cfg)
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
    payload = load_checkpoint(path, rebuild_state=False)
    state = payload["state"]
    # v2 stores plain dicts (no optimizer rebuild needed for weights-only)
    pick = (state.__getitem__ if isinstance(state, dict)
            else lambda k: getattr(state, k))
    out = {}
    if which in ("tap", "tap_cg"):
        out["tap_params"] = pick("tap_params")
    if which in ("cg", "tap_cg"):
        out["cg_params"] = pick("cg_params")
    return out
