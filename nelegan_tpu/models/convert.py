"""Torch checkpoint <-> flax pytree converters.

The reference saves `{'enhance-model': G.state_dict(), 'intel-model':
D.state_dict()}` (reference: train_nele.py:272-277).  The forward
converters map those state dicts onto the flax module trees in this
package so pretrained reference checkpoints (e.g. trained_model/
chkpt_GD.pt) load directly and produce matching outputs (verified by
tests/test_models.py against the reference torch modules themselves).

The reverse converters (`flax_*_to_torch`, `save_torch_checkpoint`)
emit the reference's exact state-dict keys/layouts — including the
spectral-norm `weight_orig`/`weight_u`/`weight_v` triplets torch's
`spectral_norm` stores (reference: model.py:43-166) — so a model
trained HERE loads into the reference's torch modules with
`load_state_dict(strict=True)` and deploys through its inference stack
unchanged (cli/export_torch.py; round-trip + strict-load parity in
tests/test_models.py).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def torch_generator_to_flax(sd: Mapping[str, Any],
                            n_blocks: int = 6) -> Dict[str, Any]:
    """Reference Generator_Conv1D_cLN state dict -> flax Generator params.

    torch layouts: Conv1d weight [out, in, k] -> flax [k, in, out];
    Linear weight [out, in] -> flax [in, out]; cLN gain/bias [1, C, 1] -> [C].
    """
    params: Dict[str, Any] = {}
    for i in range(n_blocks):
        w = _np(sd[f"convolutions.{i}.0.conv.weight"])
        b = _np(sd[f"convolutions.{i}.0.conv.bias"])
        params[f"block{i}_conv"] = {
            "Conv_0": {"kernel": w.transpose(2, 1, 0), "bias": b}}
        params[f"block{i}_cln"] = {
            "gain": _np(sd[f"convolutions.{i}.2.gain0"]).reshape(-1),
            "bias": _np(sd[f"convolutions.{i}.2.bias0"]).reshape(-1)}
    for fc in ("fc1", "fc2"):
        params[fc] = {"kernel": _np(sd[f"{fc}.weight"]).T,
                      "bias": _np(sd[f"{fc}.bias"])}
    return params


def torch_discriminator_to_flax(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference Discriminator[_Quality] state dict -> flax variables.

    Returns {'params': ..., 'spectral': ...}; the spectral collection carries
    torch's stored power-iteration vectors (weight_u, weight_v) so eval-mode
    outputs match exactly.
    """
    params: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}
    for i in range(5):
        w = _np(sd[f"layers.{i}.weight_orig"])      # [out, in, kh, kw]
        params[f"conv{i}"] = {
            "weight_orig": w.transpose(2, 3, 1, 0),  # -> [kh, kw, in, out]
            "bias": _np(sd[f"layers.{i}.bias"])}
        spectral[f"conv{i}"] = {"u": _np(sd[f"layers.{i}.weight_u"]),
                                "v": _np(sd[f"layers.{i}.weight_v"])}
    for fc in ("fc1", "fc2", "fc3"):
        params[fc] = {"weight_orig": _np(sd[f"{fc}.weight_orig"]).T,
                      "bias": _np(sd[f"{fc}.bias"])}
        spectral[fc] = {"u": _np(sd[f"{fc}.weight_u"]),
                        "v": _np(sd[f"{fc}.weight_v"])}
    return {"params": {"trunk": params}, "spectral": {"trunk": spectral}}


def flax_generator_to_torch(params: Mapping[str, Any],
                            n_blocks: int = 6) -> Dict[str, np.ndarray]:
    """Flax Generator params -> reference Generator_Conv1D_cLN state dict.

    Exact inverse of torch_generator_to_flax: flax Conv kernel
    [k, in, out] -> torch Conv1d weight [out, in, k]; flax Dense kernel
    [in, out] -> torch Linear weight [out, in]; cLN gain/bias [C] ->
    torch [1, C, 1] (reference: model.py:10-41)."""
    sd: Dict[str, np.ndarray] = {}
    for i in range(n_blocks):
        conv = params[f"block{i}_conv"]["Conv_0"]
        sd[f"convolutions.{i}.0.conv.weight"] = (
            np.asarray(conv["kernel"], np.float32).transpose(2, 1, 0))
        sd[f"convolutions.{i}.0.conv.bias"] = np.asarray(
            conv["bias"], np.float32)
        cln = params[f"block{i}_cln"]
        sd[f"convolutions.{i}.2.gain0"] = np.asarray(
            cln["gain"], np.float32).reshape(1, -1, 1)
        sd[f"convolutions.{i}.2.bias0"] = np.asarray(
            cln["bias"], np.float32).reshape(1, -1, 1)
    for fc in ("fc1", "fc2"):
        sd[f"{fc}.weight"] = np.asarray(
            params[fc]["kernel"], np.float32).T
        sd[f"{fc}.bias"] = np.asarray(params[fc]["bias"], np.float32)
    return sd


def flax_discriminator_to_torch(
        variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Flax Discriminator {'params','spectral'} -> reference state dict.

    Exact inverse of torch_discriminator_to_flax; the stored power-
    iteration vectors ride along so eval-mode outputs match bit-for-bit
    after the round trip (torch's spectral_norm keeps `weight_orig` plus
    the `weight_u`/`weight_v` buffers in the state dict — the plain
    `weight` is a recomputed attribute, never serialised)."""
    params = variables["params"]["trunk"]
    spectral = variables["spectral"]["trunk"]
    sd: Dict[str, np.ndarray] = {}
    for i in range(5):
        sd[f"layers.{i}.weight_orig"] = np.asarray(
            params[f"conv{i}"]["weight_orig"],
            np.float32).transpose(3, 2, 0, 1)   # [kh,kw,in,out]->[out,in,kh,kw]
        sd[f"layers.{i}.bias"] = np.asarray(
            params[f"conv{i}"]["bias"], np.float32)
        sd[f"layers.{i}.weight_u"] = np.asarray(
            spectral[f"conv{i}"]["u"], np.float32)
        sd[f"layers.{i}.weight_v"] = np.asarray(
            spectral[f"conv{i}"]["v"], np.float32)
    for fc in ("fc1", "fc2", "fc3"):
        sd[f"{fc}.weight_orig"] = np.asarray(
            params[fc]["weight_orig"], np.float32).T
        sd[f"{fc}.bias"] = np.asarray(params[fc]["bias"], np.float32)
        sd[f"{fc}.weight_u"] = np.asarray(spectral[fc]["u"], np.float32)
        sd[f"{fc}.weight_v"] = np.asarray(spectral[fc]["v"], np.float32)
    return sd


def save_torch_checkpoint(path: str,
                          generator: Optional[Mapping[str, Any]] = None,
                          intel: Optional[Mapping[str, Any]] = None,
                          quality: Optional[Mapping[str, Any]] = None,
                          n_blocks: int = 6) -> str:
    """Write a reference-format chkpt_GD.pt (train_nele.py:272-277).

    `generator` is a flax params pytree; `intel`/`quality` are
    {'params', 'spectral'} variable trees (e.g. straight from a
    TrainState).  Only the models passed are written."""
    import torch

    def _t(sd):
        # copy: jax-backed numpy views are non-writable, torch tensors
        # must own writable storage
        return {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}

    blob: Dict[str, Any] = {}
    if generator is not None:
        blob["enhance-model"] = _t(
            flax_generator_to_torch(generator, n_blocks))
    if intel is not None:
        blob["intel-model"] = _t(flax_discriminator_to_torch(intel))
    if quality is not None:
        blob["quality-model"] = _t(flax_discriminator_to_torch(quality))
    torch.save(blob, path)
    return path


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference chkpt_*.pt and convert every model it contains.

    Returns a dict with any of: 'generator' (params pytree),
    'intel' / 'quality' ({'params', 'spectral'} pytrees).
    """
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=True)
    out: Dict[str, Any] = {}
    if "enhance-model" in blob:
        out["generator"] = torch_generator_to_flax(blob["enhance-model"])
    if "intel-model" in blob:
        out["intel"] = torch_discriminator_to_flax(blob["intel-model"])
    if "quality-model" in blob:
        out["quality"] = torch_discriminator_to_flax(blob["quality-model"])
    return out
