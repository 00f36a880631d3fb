"""Shared exclusive-range framing (pystoi/pysiib convention:
frames start at 0, hop, ... while start < n - framelen)."""
from __future__ import annotations

import numpy as np


def frame_exclusive(x, framelen: int, hop: int):
    n = x.shape[-1]
    nframes = -(-(n - framelen) // hop) if n > framelen else 0
    idx = np.arange(nframes)[:, None] * hop + np.arange(framelen)[None, :]
    return x[..., idx]
