from svbrdf_tpu.data.dataset import SvbrdfDataset  # noqa: F401
from svbrdf_tpu.data import pipeline, strips  # noqa: F401
