"""Interop roundtrips: Flax <-> reference torch state_dict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svbrdf_tpu.interop import export_torch_state_dict, port_torch_state_dict
from svbrdf_tpu.models import SingleViewModel


def test_export_port_roundtrip():
    model = SingleViewModel(use_coords=False, num_filters=8, depth=5)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    sd = export_torch_state_dict(params)
    back = port_torch_state_dict(sd, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_loads_into_reference_model(reference_modules):
    """Full-size export must load into the torch reference (strict=False:
    the reference's unused enc1 merge FC has no counterpart here) and
    produce the same forward output."""
    import torch

    ref_models = reference_modules["models"]
    model = SingleViewModel(use_coords=False)
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, 256, 256, 3)))["params"]

    tmodel = ref_models.SingleViewModel(use_coords=False).eval()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(params).items()}
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not unexpected
    assert all("enc1.conv.merge" in k for k in missing)

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4)


test_export_loads_into_reference_model = pytest.mark.slow(
    test_export_loads_into_reference_model)
