from nelegan_tpu.dsp.stft import stft, istft, hann_periodic  # noqa: F401
from nelegan_tpu.dsp.erb import (  # noqa: F401
    band_analysis_matrix,
    band_synthesis_matrix,
    band_energy,
    interp_band_gain,
)
from nelegan_tpu.dsp.imcra import imcra_estimate_psd  # noqa: F401
from nelegan_tpu.dsp.features import (  # noqa: F401
    featurize_speech,
    featurize_noise,
    resynthesize,
)
from nelegan_tpu.dsp.resample import resample_poly  # noqa: F401
from nelegan_tpu.dsp.asl_p56 import asl_p56  # noqa: F401
