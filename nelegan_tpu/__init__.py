"""nelegan_tpu — TPU-native multi-metric GAN framework for near-end listening
enhancement (NELE), a from-scratch JAX/XLA/Pallas rebuild with the capabilities
of nii-yamagishilab/NELE-GAN.

Layers (mirrors the reference's layer map, re-architected TPU-first):
  dsp/      STFT / ERB band analysis-synthesis / IMCRA noise PSD / P.56 ASL
            — matmul + lax.scan formulations instead of per-frame Python loops
  models/   Generator (causal conv + cumulative LayerNorm) and the two
            MetricGAN discriminators (spectral-norm conv trunks), in flax
  metrics/  On-device differentiable intelligibility & quality metrics
            (ESTOI, SIIB^Gauss, HASPI v1/v2, HASQI v2, full ITU-T P.862
            PESQ, ViSQOL speech mode)
  ops/      Pallas/associative-scan kernels for the IIR hot loops
  data/     Bucketed/padded utterance batching (native C++ wav loader)
  train/    Jitted GAN steps, replay buffer, orbax checkpointing
  parallel/ Mesh/sharding helpers (dp over utterances, tp over channels)
  cli/      train / infer / eval entry points with a typed config
"""

__version__ = "0.1.0"

from nelegan_tpu.config import Config, default_config  # noqa: F401
