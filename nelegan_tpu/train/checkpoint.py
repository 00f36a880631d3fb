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
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from nelegan_tpu.train.gan import TrainState


def prune_checkpoints(directory: str, current_epoch: int,
                      keep_every: int, keep_last: int) -> int:
    """Delete chkpt_<e>.msgpack(+sidecar) files that are neither among the
    keep_last most recent epochs nor divisible by keep_every.  No-op when
    keep_every <= 0 (keep-all, reference semantics).  Returns #pruned."""
    if keep_every <= 0:
        return 0
    import glob
    import re
    pruned = 0
    for p in glob.glob(os.path.join(directory, "chkpt_*.msgpack")):
        m = re.match(r"chkpt_(\d+)\.msgpack$", os.path.basename(p))
        if not m:
            continue
        e = int(m.group(1))
        if e % keep_every == 0 or e > current_epoch - keep_last:
            continue
        for f in (p, p + ".json"):
            if os.path.exists(f):
                os.remove(f)
        pruned += 1
    return pruned


def save_checkpoint(directory: str, epoch: int, state: TrainState,
                    rng: jax.Array, replay_json: str = "[]",
                    extra: Optional[Dict[str, Any]] = None,
                    keep_every: int = 0, keep_last: int = 5) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"chkpt_{epoch}.msgpack")
    # batched fetch: to_bytes on device arrays pulls each leaf separately
    # (~250 tunnel round trips, ~8 s/epoch measured) — pack + fetch first
    from nelegan_tpu.utils.transfer import fetch_pytree
    blob = serialization.to_bytes({
        "state": fetch_pytree(state._asdict()),
        "rng": np.asarray(jax.random.key_data(rng)),
    })
    meta = {"epoch": epoch, "replay": replay_json, "extra": extra or {}}
    # atomic publication: write both files under tmp names, fsync, then
    # rename data -> sidecar -> `latest` (a crash mid-save — now possible
    # mid-epoch, the fetch overlaps the next epoch's compute via
    # AsyncSaver — must never leave a truncated blob behind a live
    # `latest`, and a sidecar must never exist without its blob)
    with open(path + ".tmp", "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(path + ".tmp", path)
    with open(path + ".json.tmp", "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(path + ".json.tmp", path + ".json")
    latest = os.path.join(directory, "latest")
    tmp = latest + ".tmp"
    if os.path.lexists(tmp):
        os.remove(tmp)
    os.symlink(os.path.basename(path), tmp)
    os.replace(tmp, latest)
    prune_checkpoints(directory, epoch, keep_every, keep_last)
    return path


class AsyncSaver:
    """Overlap save_checkpoint's device->host fetch and disk write with the
    next epoch's compute.

    The checkpoint phase cost 3.9 s/epoch — 6.5% of reference-scale wall
    clock (r4 artifacts/train_report/timing.json) — and is pure tunnel
    transfer (~100 MB of state at ~25-35 MB/s).  JAX arrays are immutable,
    so the end-of-epoch state pytree is a consistent snapshot no matter
    when the fetch runs; the next epoch's phases are compute-bound with
    only small uploads, so the transfer rides an otherwise idle tunnel.

    One save in flight at a time: `save_async` joins the previous save
    first (bounding memory at one extra state snapshot), and `wait`
    re-raises any background failure — callers must wait() before reading
    checkpoints back (resume, end of run).  If the process dies mid-save
    the atomic rename discards the partial file and `latest` still names
    the previous epoch: elastic recovery replays one epoch, exactly like
    a crash before the save started.
    """

    # in-flight saves by checkpoint directory, across ALL saver instances:
    # a resume through a *different* AsyncSaver (a freshly constructed
    # Trainer — tests, run_with_recovery's retry factory) must not read
    # `latest` while another instance's background save is still flipping
    # it, or it silently resumes one epoch early
    _inflight: Dict[str, "threading.Thread"] = {}
    _inflight_lock = threading.Lock()

    def __init__(self):
        self._thread = None
        self._err: Optional[BaseException] = None

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    @classmethod
    def barrier(cls, directory: str) -> None:
        """Join any in-flight save to `directory`, whichever saver instance
        started it (errors still surface on the owner's wait())."""
        if not os.path.isdir(directory):
            directory = os.path.dirname(directory) or "."
        with cls._inflight_lock:
            t = cls._inflight.get(os.path.realpath(directory))
        if t is not None:
            t.join()

    def save_async(self, directory: str, epoch: int, state: TrainState,
                   rng: jax.Array, replay_json: str = "[]",
                   extra: Optional[Dict[str, Any]] = None,
                   keep_every: int = 0, keep_last: int = 5) -> None:
        self.wait()
        key = os.path.realpath(directory)

        def run():
            try:
                save_checkpoint(directory, epoch, state, rng, replay_json,
                                extra, keep_every=keep_every,
                                keep_last=keep_last)
            except BaseException as e:  # surfaced on the next wait()
                self._err = e
            finally:
                with AsyncSaver._inflight_lock:
                    if AsyncSaver._inflight.get(key) is thread:
                        del AsyncSaver._inflight[key]

        thread = threading.Thread(target=run, daemon=True,
                                  name="nele-ckpt-saver")
        with AsyncSaver._inflight_lock:
            AsyncSaver._inflight[key] = thread
        self._thread = thread
        thread.start()


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
