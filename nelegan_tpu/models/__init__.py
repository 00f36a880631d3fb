from nelegan_tpu.models.generator import Generator  # noqa: F401
from nelegan_tpu.models.discriminator import (  # noqa: F401
    IntelDiscriminator,
    QualityDiscriminator,
)
from nelegan_tpu.models.convert import (  # noqa: F401
    torch_generator_to_flax,
    torch_discriminator_to_flax,
    load_torch_checkpoint,
)
