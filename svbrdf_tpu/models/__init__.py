from svbrdf_tpu.models.generator import Generator  # noqa: F401
from svbrdf_tpu.models.single_view import SingleViewModel  # noqa: F401
from svbrdf_tpu.models.multi_view import MultiViewModel  # noqa: F401


def build_model(model_type: str, use_coords: bool = False, **kwargs):
    """Model factory by name ('single' | 'multi'). Reference cli.py:52-54."""
    if model_type == "single":
        return SingleViewModel(use_coords=use_coords, **kwargs)
    if model_type == "multi":
        return MultiViewModel(use_coords=use_coords, **kwargs)
    raise ValueError(f"unknown model type '{model_type}'")
