"""Checkpointing: full training state, resumable.

The reference saves only the G and D weight dicts per epoch and resumes by
hand-editing code (reference: train_nele.py:76-85, 272-277) — optimizer
state, epoch counter, RNG, and the replay list are lost on restart.  Here a
checkpoint is the *complete* state: all three models (params + spectral-norm
vectors), all three optimiser states, step counters, the PRNG key, the epoch
number, and the replay buffer; `load_checkpoint` resumes exactly.

Format: msgpack (flax.serialization) for the pytree + a small JSON sidecar,
one file per epoch plus a `latest` symlink.  `load_reference_checkpoint`
additionally accepts the reference's torch chkpt_*.pt files via
models/convert.py.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from nelegan_tpu.train.gan import TrainState


def save_checkpoint(directory: str, epoch: int, state: TrainState,
                    rng: jax.Array, replay_json: str = "[]",
                    extra: Optional[Dict[str, Any]] = None) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"chkpt_{epoch}.msgpack")
    # batched fetch: to_bytes on device arrays pulls each leaf separately
    # (~250 tunnel round trips, ~8 s/epoch measured) — pack + fetch first
    from nelegan_tpu.utils.transfer import fetch_pytree
    blob = serialization.to_bytes({
        "state": fetch_pytree(state._asdict()),
        "rng": np.asarray(jax.random.key_data(rng)),
    })
    with open(path, "wb") as f:
        f.write(blob)
    meta = {"epoch": epoch, "replay": replay_json, "extra": extra or {}}
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    latest = os.path.join(directory, "latest")
    tmp = latest + ".tmp"
    if os.path.lexists(tmp):
        os.remove(tmp)
    os.symlink(os.path.basename(path), tmp)
    os.replace(tmp, latest)
    return path


def load_checkpoint(path: str, template_state: TrainState
                    ) -> Tuple[TrainState, jax.Array, int, str]:
    """-> (state, rng, epoch, replay_json).  `path` may be the directory
    (uses `latest`) or a specific .msgpack file.  `load_checkpoint_full`
    additionally returns the sidecar's `extra` dict — always the one
    belonging to the SAME checkpoint file (a caller re-deriving the
    sidecar path from `latest` would mix epochs when given an explicit
    older .msgpack)."""
    state, rng, epoch, replay_json, _ = load_checkpoint_full(
        path, template_state)
    return state, rng, epoch, replay_json


def load_checkpoint_full(path: str, template_state: TrainState):
    """-> (state, rng, epoch, replay_json, extra)."""
    if os.path.isdir(path):
        path = os.path.join(path, "latest")
    path = os.path.realpath(path)
    with open(path, "rb") as f:
        blob = f.read()
    target = {"state": template_state._asdict(),
              "rng": np.zeros(2, np.uint32)}
    restored = serialization.from_bytes(target, blob)
    state = TrainState(**restored["state"])
    rng = jax.random.wrap_key_data(jnp.asarray(restored["rng"]))
    with open(path + ".json") as f:
        meta = json.load(f)
    return (state, rng, int(meta["epoch"]), meta.get("replay", "[]"),
            meta.get("extra") or {})


def peek_meta(path: str) -> Dict[str, Any]:
    """Sidecar metadata (epoch/replay/extra) WITHOUT restoring arrays —
    lets callers rebuild the Config (extra['config']) before allocating a
    template state of the right shape."""
    if os.path.isdir(path):
        path = os.path.join(path, "latest")
    path = os.path.realpath(path)
    with open(path + ".json") as f:
        return json.load(f)


def config_for_checkpoint(path: Optional[str]):
    """The Config a checkpoint was trained with (sidecar
    extra['config']), falling back to defaults for reference-format /
    pre-sidecar checkpoints or when no checkpoint is given.  Every CLI
    that builds a template TrainState for load_checkpoint should size it
    with this, not Config() (a non-default gen_blocks/disc_channels run
    would otherwise fail to restore)."""
    from nelegan_tpu.config import Config, config_from_dict
    if path:
        try:
            return config_from_dict(peek_meta(path)["extra"]["config"])
        except (KeyError, FileNotFoundError, json.JSONDecodeError):
            pass
    return Config()


def load_reference_checkpoint(path: str, state: TrainState) -> TrainState:
    """Load a reference torch chkpt_*.pt into the matching slots."""
    from nelegan_tpu.models.convert import load_torch_checkpoint
    blobs = load_torch_checkpoint(path)
    if "generator" in blobs:
        state = state._replace(gen_params=blobs["generator"])
    if "intel" in blobs:
        state = state._replace(d_params=blobs["intel"]["params"],
                               d_spectral=blobs["intel"]["spectral"])
    if "quality" in blobs:
        state = state._replace(dq_params=blobs["quality"]["params"],
                               dq_spectral=blobs["quality"]["spectral"])
    return state
