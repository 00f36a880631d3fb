"""Torch checkpoint -> flax pytree converters.

The reference saves `{'enhance-model': G.state_dict(), 'intel-model':
D.state_dict()}` (reference: train_nele.py:272-277).  These converters map
those state dicts onto the flax module trees in this package so pretrained
reference checkpoints (e.g. trained_model/chkpt_GD.pt) load directly and
produce matching outputs (verified by tests/test_models.py against the
reference torch modules themselves).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

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
