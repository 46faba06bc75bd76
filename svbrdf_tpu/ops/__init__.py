from svbrdf_tpu.ops import codecs, render, sampling  # noqa: F401
