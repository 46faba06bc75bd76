from svbrdf_tpu.training.checkpoint import Checkpoint  # noqa: F401
