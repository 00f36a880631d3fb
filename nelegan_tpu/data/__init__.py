from nelegan_tpu.data.wavio import (  # noqa: F401
    read_wav,
    read_wav_batch,
    write_wav_pcm16,
    wav_length,
    native_available,
)
from nelegan_tpu.data.pipeline import (  # noqa: F401
    UtteranceBatch,
    CorpusIndex,
    BucketedLoader,
)
