from nelegan_tpu.utils.profiling import StepTimer, trace_context  # noqa: F401
