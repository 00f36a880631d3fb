"""Independent plain-numpy metric oracles.

Clean-room second implementations of ESTOI and SIIB^Gauss written straight
from their publications, deliberately sharing NOTHING with the package
implementations (no JAX, no nelegan_tpu imports, dynamic shapes instead of
masked static shapes, scipy's resampler instead of ours).  They exist to
cross-validate `nelegan_tpu.metrics.estoi` / `.siib`: an error in a band
matrix, a frame rule, or the silence threshold of either side shows up as a
disagreement (tests/test_oracles.py).
"""
from tools.oracles.estoi_np import estoi_oracle  # noqa: F401
from tools.oracles.siib_np import siib_gauss_oracle  # noqa: F401
