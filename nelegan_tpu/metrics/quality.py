"""Quality metrics: compatibility re-exports of the full implementations.

The reference scores quality with two *external native* engines: the pypesq
C extension (reference: intel.py:9,142-160) and the ViSQOL C++ executable
shelled out per batch (reference: audio_util.py:232-265).  Neither engine is
vendorable; both are re-implemented on-device in this framework:

  * PESQ — `nelegan_tpu.metrics.pesq.pesq_p862`: the complete ITU-T P.862
    perceptual/cognitive model (level alignment, WB input filter, Bark
    warping, frequency & gain compensation, Zwicker loudness, masked
    symmetric/asymmetric disturbance, Lpq pooling, P.862.2 MOS-LQO map).
  * ViSQOL — `nelegan_tpu.metrics.visqol.visqol_speech`: the full speech-
    mode structure (gammatonegram, active-patch selection, NSIM-maximising
    patch alignment, NSIM pooling, fitted MOS-LQO map).

Each module documents its deviations from the closed upstream binaries.
The quality discriminator only ever consumes *calibrated scores*
(reference: dataloader.py:75, train_nele.py:152), so training semantics
are preserved.  The `*_proxy` names are kept for earlier revisions' call
sites; `metrics.oracles` hooks up the external engines where installed.
"""
from __future__ import annotations

from nelegan_tpu.metrics.pesq import (  # noqa: F401
    pesq_p862 as pesq_proxy, pesq_p862_16k as pesq_proxy_16k)
from nelegan_tpu.metrics.visqol import (  # noqa: F401
    visqol_speech as visqol_proxy, visqol_speech_16k as visqol_proxy_16k)
