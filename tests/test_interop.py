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


def test_export_casts_bf16_masters_to_f32():
    """bf16-SR master checkpoints store >=2-D leaves in bfloat16
    (parallel/step.master_dtype_policy default); the exported state_dict
    must be f32 for torch/reference interop."""
    model = SingleViewModel(use_coords=False, num_filters=8, depth=5)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    bf16_masters = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params)
    sd = export_torch_state_dict(bf16_masters)
    assert all(w.dtype == np.float32 for w in sd.values())
    back = port_torch_state_dict(sd, params)
    for a, b in zip(jax.tree.leaves(bf16_masters), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_export_synthesizes_enc1_merge_weight():
    """The reference model's strict load needs the enc1 merge FC weight it
    always creates but never applies (reference models.py:41-45); the
    export synthesizes it as zeros of the right shape."""
    model = SingleViewModel(use_coords=False, num_filters=8, depth=5)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    sd = export_torch_state_dict(params)
    w = sd["generator.enc1.conv.merge.fully_connected.weight"]
    assert w.shape == (8, 8)
    assert not w.any()


def test_export_loads_into_reference_model(reference_modules):
    """Full-size export must load into the torch reference with a STRICT
    load_state_dict (the reference's own loading path,
    persistence.py:96-103) and produce the same forward output."""
    import torch

    ref_models = reference_modules["models"]
    model = SingleViewModel(use_coords=False)
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, 256, 256, 3)))["params"]

    tmodel = ref_models.SingleViewModel(use_coords=False).eval()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(params).items()}
    tmodel.load_state_dict(sd, strict=True)

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


def _small_model_and_params(seed=0):
    model = SingleViewModel(use_coords=False, num_filters=8, depth=5)
    params = model.init(jax.random.key(seed),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    return model, params


def _torch_state_dict(params):
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_torch_state_dict(params).items()}


class TestTorchCheckpointIngestion:
    def test_cli_export_torch_checkpoint(self, tmp_path, toy_data_dir):
        """test mode --export-torch-checkpoint writes a reference-format
        checkpoint.tar that torch can load with the expected keys."""
        import torch

        from svbrdf_tpu import main as main_mod

        model_dir = tmp_path / "m"
        common = [
            "--input-dir", str(toy_data_dir / "train"),
            "--image-count", "10", "--used-image-count", "1",
            "--image-size", "32", "--model-depth", "5",
            "--num-filters", "8", "--batch-size", "2",
            "--model-dir", str(model_dir),
        ]
        main_mod.main(["--mode", "train", "--epochs", "1",
                       "--save-frequency", "1", "--validation-frequency",
                       "999", "--retrain"] + common)
        out = tmp_path / "exported_checkpoint.tar"
        main_mod.main(["--mode", "test",
                       "--export-torch-checkpoint", str(out)] + common)
        ckpt = torch.load(str(out), map_location="cpu",
                          weights_only=False)
        assert ckpt["model_type"] == "single"
        assert ckpt["use_coords"] is False
        sd = ckpt["model_state_dict"]
        assert any(k.startswith("generator.enc1.") for k in sd)
        assert all(isinstance(v, torch.Tensor) for v in sd.values())

    def test_import_flag_cleared_for_post_training_viz(self, monkeypatch,
                                                       tmp_path):
        """main() must NOT re-import the torch checkpoint for the
        post-training visualization pass — that would silently visualize
        the PRE-training weights instead of the just-trained ones."""
        from svbrdf_tpu import main as main_mod
        from svbrdf_tpu.training import loop

        seen = {}
        monkeypatch.setattr(
            loop, "run_training",
            lambda args: seen.setdefault("train", args.import_torch_checkpoint))
        monkeypatch.setattr(
            loop, "run_test",
            lambda args, **kw: seen.setdefault(
                "test", args.import_torch_checkpoint))
        main_mod.main([
            "--mode", "train", "--input-dir", str(tmp_path),
            "--image-count", "10", "--model-dir", str(tmp_path / "m"),
            "--import-torch-checkpoint", "ref_checkpoint.tar",
        ])
        assert seen["train"] == "ref_checkpoint.tar"
        assert seen["test"] is None
    """Reference checkpoints load through our Checkpoint / CLI path
    (reference persistence.py:14-50: checkpoint.tar + legacy formats)."""

    def test_checkpoint_tar_autodetected(self, tmp_path):
        import torch

        from svbrdf_tpu.training.checkpoint import Checkpoint

        _model, params = _small_model_and_params()
        torch.save({"model_type": "single", "use_coords": False,
                    "epoch": 7, "model_state_dict": _torch_state_dict(params),
                    "optimizer_state_dict": {}},
                   tmp_path / "checkpoint.tar")

        ck = Checkpoint.load(tmp_path)  # detected without our Orbax state
        assert ck.is_valid()
        restored = ck.restore_params(jax.tree.map(jnp.zeros_like, params))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert ck.restore_epoch(0) == 7

        import argparse

        args = argparse.Namespace(model_type="multi", use_coords=True)
        args = ck.restore_args(args)
        assert args.model_type == "single" and args.use_coords is False

        # No portable optimizer state: the template comes back unchanged.
        sentinel = object()
        assert ck.restore_opt_state(sentinel) is sentinel

    def test_legacy_model_data_with_state_json(self, tmp_path):
        import json

        import torch

        from svbrdf_tpu.training.checkpoint import Checkpoint

        _model, params = _small_model_and_params(seed=3)
        torch.save(_torch_state_dict(params), tmp_path / "model.data")
        (tmp_path / "state.json").write_text(json.dumps({"epoch": 42}))

        ck = Checkpoint.load(tmp_path)
        assert ck.is_valid()
        assert ck.restore_epoch(0) == 42
        restored = ck.restore_params(jax.tree.map(jnp.zeros_like, params))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_explicit_file_path(self, tmp_path):
        import torch

        from svbrdf_tpu.training.checkpoint import Checkpoint

        _model, params = _small_model_and_params(seed=5)
        torch.save({"model_state_dict": _torch_state_dict(params),
                    "epoch": 1}, tmp_path / "checkpoint.tar")
        ck = Checkpoint.load_torch(tmp_path / "checkpoint.tar")
        assert ck.is_valid()

    def test_missing_torch_checkpoint_invalid(self, tmp_path):
        from svbrdf_tpu.training.checkpoint import Checkpoint

        assert not Checkpoint.load_torch(tmp_path).is_valid()


@pytest.mark.slow
def test_cli_test_mode_with_reference_checkpoint(reference_modules,
                                                 tmp_path):
    """End-to-end per VERDICT r1 #3: a torch-initialized reference
    checkpoint.tar loaded through the CLI setup path predicts within 2e-4
    of the torch model."""
    import torch

    from svbrdf_tpu.cli import parse_args
    from svbrdf_tpu.training import loop

    ref_models = reference_modules["models"]
    torch.manual_seed(11)
    tmodel = ref_models.SingleViewModel(use_coords=False).eval()
    model_dir = tmp_path / "torch_model"
    model_dir.mkdir()
    torch.save({"model_type": "single", "use_coords": False, "epoch": 0,
                "model_state_dict": tmodel.state_dict()},
               model_dir / "checkpoint.tar")

    args = parse_args([
        "--mode", "test", "--input-dir", str(tmp_path), "--image-count",
        "0", "--model-dir", str(model_dir)])
    with jax.default_matmul_precision("highest"):
        (args, model, params, _opt, _st, _ep, _key) = loop.setup(args, None)
        rng = np.random.default_rng(12)
        x = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                      deterministic=True))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4)
