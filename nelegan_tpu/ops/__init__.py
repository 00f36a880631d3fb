from nelegan_tpu.ops.iir import (  # noqa: F401
    one_pole,
    one_pole_cascade,
    biquad,
    fir,
    linear_recurrence_2x2,
)
