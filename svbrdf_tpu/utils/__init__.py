from svbrdf_tpu.utils.profiling import StepTimer, trace_steps  # noqa: F401
