"""SvbrdfEstimator: checkpoint -> predict -> export roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from svbrdf_tpu.estimator import SvbrdfEstimator
from svbrdf_tpu.models import SingleViewModel
from svbrdf_tpu.training.checkpoint import Checkpoint


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("est") / "model"
    model = SingleViewModel(use_coords=False, num_filters=4, depth=4)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 1, 16, 16, 3)))["params"]
    opt_state = optax.adam(1e-4).init(params)
    Checkpoint.save(d, params, opt_state, epoch=0, model_type="single",
                    use_coords=False,
                    extra_meta={"model_depth": 4, "num_filters": 4})
    return d


def test_from_checkpoint_and_predict(tiny_checkpoint):
    est = SvbrdfEstimator.from_checkpoint(tiny_checkpoint, image_size=16)
    imgs = np.random.default_rng(0).uniform(
        0, 1, (2, 16, 16, 3)).astype(np.float32)
    out = est.predict(imgs)
    assert out.shape == (2, 16, 16, 12)
    n = out[..., :3]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_from_torch_checkpoint_dir(tmp_path):
    """A model dir holding only a reference-format checkpoint.tar works
    through the same entry point (Checkpoint.load's torch auto-detection;
    the architecture comes from the checkpoint's own metadata)."""
    import torch

    from svbrdf_tpu.interop import export_torch_state_dict

    model = SingleViewModel(use_coords=False, num_filters=4, depth=4)
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, 1, 16, 16, 3)))["params"]
    d = tmp_path / "torch_model"
    d.mkdir()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(params).items()}
    torch.save({"model_type": "single", "use_coords": False, "epoch": 3,
                "model_state_dict": sd,
                "model_depth": 4, "num_filters": 4}, d / "checkpoint.tar")

    est = SvbrdfEstimator.from_checkpoint(d, image_size=16)
    imgs = np.random.default_rng(1).uniform(
        0, 1, (1, 16, 16, 3)).astype(np.float32)
    ours = est.predict(imgs)
    direct = np.asarray(model.apply({"params": params},
                                    jnp.asarray(imgs), deterministic=True))
    np.testing.assert_allclose(ours, direct, atol=1e-6)


def test_predict_to_files(tiny_checkpoint, tmp_path):
    from svbrdf_tpu.data import strips

    photo = tmp_path / "photo.png"
    strips.write_image(str(photo), np.random.default_rng(1).uniform(
        0, 1, (16, 16, 3)))
    est = SvbrdfEstimator.from_checkpoint(tiny_checkpoint, image_size=16)
    written = est.predict_to_files([str(photo)], str(tmp_path / "out"))
    assert len(written) == 1
    from PIL import Image

    assert Image.open(written[0]).size == (4 * 16, 16)


def test_missing_checkpoint_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    (tmp_path / "empty" / "meta.json").write_text("{}")
    with pytest.raises(FileNotFoundError):
        SvbrdfEstimator.from_checkpoint(tmp_path / "empty", image_size=16)
