from nelegan_tpu.train.gan import (  # noqa: F401
    TrainState,
    init_train_state,
    g_step,
    d_step,
    featurize_triple,
)
from nelegan_tpu.train.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from nelegan_tpu.train.replay import ReplayBuffer  # noqa: F401
