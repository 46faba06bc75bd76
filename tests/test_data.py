"""Data pipeline tests: strip decoding against the toy dataset, mixing,
scaling, on-device input synthesis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svbrdf_tpu.data import pipeline, strips
from svbrdf_tpu.data.dataset import SvbrdfDataset, split_train_validation
from tests.test_render import random_svbrdf


class TestStrips:
    def test_decode_strip_layout(self):
        # Synthetic strip: 2 inputs + 4 maps, each 4x4, tagged by constant.
        tiles = [np.full((4, 4, 3), v, np.float32)
                 for v in [0.1, 0.2, 0.5, 0.6, 0.7, 0.8]]
        strip = np.concatenate(tiles, axis=1)
        inputs, svbrdf = strips.decode_strip(strip, input_image_count=2)
        assert inputs.shape == (2, 4, 4, 3)
        assert svbrdf.shape == (4, 4, 12)
        np.testing.assert_allclose(inputs[0], 0.1)
        np.testing.assert_allclose(svbrdf[..., 0:3], 0.0, atol=1e-6)  # 0.5*2-1
        np.testing.assert_allclose(svbrdf[..., 3:6], 0.6)
        np.testing.assert_allclose(svbrdf[..., 9:12], 0.8)

    def test_toy_dataset_strip(self, toy_data_dir):
        files = strips.list_sample_files(str(toy_data_dir / "train"))
        assert len(files) == 2
        inputs, svbrdf = strips.load_sample(files[0], 10, 3)
        assert inputs.shape == (3, 256, 256, 3)
        assert svbrdf.shape == (256, 256, 12)
        assert -1.0 <= float(svbrdf[..., 0:3].min())
        assert float(svbrdf[..., 3:].max()) <= 1.0

    def test_last_n_selection(self, toy_data_dir):
        """used < available must return the LAST n images (dataset.py:136-138)."""
        files = strips.list_sample_files(str(toy_data_dir / "train"))
        all_inputs, _ = strips.load_sample(files[0], 10, 10)
        two, _ = strips.load_sample(files[0], 10, 2)
        np.testing.assert_array_equal(two, all_inputs[8:10])

    def test_no_svbrdf_dummy_maps(self):
        strip = np.random.default_rng(0).uniform(
            0, 1, (4, 8, 3)).astype(np.float32)
        inputs, svbrdf = strips.decode_strip(strip, 2, no_svbrdf=True)
        assert inputs.shape == (2, 4, 4, 3)
        np.testing.assert_allclose(svbrdf[..., 2], 1.0)   # normal z
        np.testing.assert_allclose(svbrdf[..., 3:], 0.0)  # flat maps


class TestMixing:
    def test_mix_alpha_extremes(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(random_svbrdf(rng, 8, 8))
        b = jnp.asarray(random_svbrdf(rng, 8, 8))
        out = pipeline.mix_materials(jax.random.key(0), a, b, alpha=1.0)
        np.testing.assert_allclose(np.asarray(out[..., 3:]),
                                   np.asarray(a[..., 3:]), atol=1e-6)
        out0 = pipeline.mix_materials(jax.random.key(0), a, b, alpha=0.0)
        np.testing.assert_allclose(np.asarray(out0[..., 3:]),
                                   np.asarray(b[..., 3:]), atol=1e-6)

    def test_mixed_normals_unit_length(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(random_svbrdf(rng, 8, 8))
        b = jnp.asarray(random_svbrdf(rng, 8, 8))
        out = pipeline.mix_materials(jax.random.key(1), a, b)
        norms = jnp.linalg.norm(out[..., 0:3], axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)

    def test_planes_target_matches_spatial_mix(self):
        """prepare_batch(planes_target=True) returns 'svbrdf_planes' equal
        to svbrdf_to_phase_planes of the NHWC mixed target — the planes-
        layout mix is the same arithmetic, just without the conversion
        copies (pipeline._planes_target)."""
        from svbrdf_tpu.ops.render_pallas import svbrdf_to_phase_planes

        rng = np.random.default_rng(3)
        for u8 in (True, False):
            if u8:
                sv = rng.integers(0, 256, (2, 16, 16, 12)).astype(np.uint8)
                partner = rng.integers(0, 256, (2, 16, 16, 12)).astype(
                    np.uint8)
            else:
                sv = np.stack([random_svbrdf(rng, 16, 16)
                               for _ in range(2)])
                partner = np.stack([random_svbrdf(rng, 16, 16)
                                    for _ in range(2)])
            raw_inputs = np.zeros((2, 0, 16, 16, 3), np.float32)
            out = pipeline.prepare_batch(
                jax.random.key(7), raw_inputs, sv, partner,
                used_input_image_count=1, planes_target=True)
            assert out["svbrdf_planes"].shape == (2, 48, 8, 8)
            want = svbrdf_to_phase_planes(out["svbrdf"])
            np.testing.assert_allclose(np.asarray(out["svbrdf_planes"]),
                                       np.asarray(want), atol=1e-6)

    def test_planes_target_from_planes_store(self):
        """Feeding pre-transposed planes raws (the device cache's planes
        store) produces the same 'svbrdf_planes' as the spatial raws."""
        rng = np.random.default_rng(6)
        sv = rng.integers(0, 256, (2, 16, 16, 12)).astype(np.uint8)
        partner = rng.integers(0, 256, (2, 16, 16, 12)).astype(np.uint8)
        raw_inputs = np.zeros((2, 0, 16, 16, 3), np.float32)
        base = pipeline.prepare_batch(
            jax.random.key(7), raw_inputs, sv, partner,
            used_input_image_count=1, planes_target=True)
        pl = pipeline.prepare_batch(
            jax.random.key(7), raw_inputs, sv, partner,
            used_input_image_count=1, planes_target=True,
            raw_svbrdf_planes=pipeline._to_phase_planes_any(
                jnp.asarray(sv)),
            partner_svbrdf_planes=pipeline._to_phase_planes_any(
                jnp.asarray(partner)))
        np.testing.assert_allclose(np.asarray(pl["svbrdf_planes"]),
                                   np.asarray(base["svbrdf_planes"]),
                                   atol=1e-6)

    def test_planes_target_no_partner(self):
        from svbrdf_tpu.ops.render_pallas import svbrdf_to_phase_planes

        rng = np.random.default_rng(4)
        sv = rng.integers(0, 256, (2, 16, 16, 12)).astype(np.uint8)
        out = pipeline.prepare_batch(
            jax.random.key(9), np.zeros((2, 0, 16, 16, 3), np.float32),
            sv, None, used_input_image_count=1, planes_target=True)
        want = svbrdf_to_phase_planes(out["svbrdf"])
        np.testing.assert_allclose(np.asarray(out["svbrdf_planes"]),
                                   np.asarray(want), atol=1e-6)

    def test_mix_matches_reference(self, reference_modules, toy_data_dir):
        import torch

        ref_dataset = reference_modules["dataset"]

        files = strips.list_sample_files(str(toy_data_dir / "train"))
        _, sv0 = strips.load_sample(files[0], 10, 0)
        _, sv1 = strips.load_sample(files[1], 10, 0)

        ours = pipeline.mix_materials(jax.random.key(0),
                                      jnp.asarray(sv0), jnp.asarray(sv1),
                                      alpha=0.3)
        ds = ref_dataset.SvbrdfDataset.__new__(ref_dataset.SvbrdfDataset)
        theirs = ds.mix(
            torch.from_numpy(sv0.transpose(2, 0, 1)),
            torch.from_numpy(sv1.transpose(2, 0, 1)),
            alpha=torch.tensor([0.3]))
        theirs = theirs.permute(1, 2, 0).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


class TestScaling:
    def test_resize_matches_torch_bilinear(self):
        import torch

        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        ours = np.asarray(pipeline.resize_bilinear(jnp.asarray(x), size=8))
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(8, 8),
            mode="bilinear")
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_center_crop(self):
        x = np.zeros((2, 4, 8, 3), np.float32)
        out = pipeline.center_crop_to_square(jnp.asarray(x))
        assert out.shape == (2, 4, 4, 3)


class TestToyDataset:
    def test_generate_and_load(self, tmp_path):
        from svbrdf_tpu.data import strips, toy
        from svbrdf_tpu.data.dataset import SvbrdfDataset

        paths = toy.generate_toy_dataset(str(tmp_path), size=32,
                                         n_train=2, n_test=1, seed=99)
        assert len(paths) == 3
        inputs, sv = strips.load_sample(paths[0], 10, 10)
        assert inputs.shape == (10, 32, 32, 3)
        assert sv.shape == (32, 32, 12)
        # Normals decode to (approximately) unit vectors through the
        # 8-bit strip roundtrip; other maps stay in [0, 1].
        norms = np.linalg.norm(sv[..., :3], axis=-1)
        assert np.abs(norms - 1.0).max() < 0.02
        assert sv[..., 3:].min() >= 0.0 and sv[..., 3:].max() <= 1.0

        data = SvbrdfDataset(str(tmp_path / "train"), image_size=32,
                             input_image_count=10, used_input_image_count=1,
                             mix_materials=False)
        assert len(data) == 2
        sample = data[0]
        assert sample["inputs"].shape == (1, 32, 32, 3)

    def test_deterministic_by_seed(self, tmp_path):
        from svbrdf_tpu.data import toy

        a = toy.make_toy_svbrdf(np.random.default_rng(7), 16)
        b = toy.make_toy_svbrdf(np.random.default_rng(7), 16)
        np.testing.assert_array_equal(a, b)


class TestSynthesis:
    def test_shapes_and_range(self):
        rng = np.random.default_rng(4)
        sv = jnp.asarray(random_svbrdf(rng, 16, 16))
        out = pipeline.synthesize_inputs(jax.random.key(0), sv, count=3)
        assert out.shape == (3, 16, 16, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_deterministic_by_key(self):
        rng = np.random.default_rng(5)
        sv = jnp.asarray(random_svbrdf(rng, 8, 8))
        a = pipeline.synthesize_inputs(jax.random.key(3), sv, count=2)
        b = pipeline.synthesize_inputs(jax.random.key(3), sv, count=2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_noise_std_is_per_image(self):
        # Each synthesized photo draws its OWN log-normal noise std
        # (reference dataset.py:215 draws one per rendering) — a shared
        # std would correlate augmentation noise across a sample's photos.
        import math

        from svbrdf_tpu.ops import render

        rng = np.random.default_rng(6)
        sv = jnp.asarray(random_svbrdf(rng, 8, 8))
        key = jax.random.key(7)
        out = pipeline.synthesize_inputs(key, sv, count=3,
                                         use_augmentation=False)

        k_scene, k_std, k_noise = jax.random.split(key, 3)
        scenes = pipeline.generate_input_scenes(k_scene, 3,
                                                use_augmentation=False)
        renders = render.render(scenes, sv[None])
        stds = jnp.exp(math.log(0.005)
                       + 0.3 * jax.random.normal(k_std, (3, 1, 1, 1)))
        expected = jnp.clip(
            renders + stds * jax.random.normal(k_noise, renders.shape),
            0.0, 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   atol=1e-5)
        assert len(set(np.asarray(stds).ravel().tolist())) == 3

    def test_no_augmentation_uses_fixed_config(self):
        scenes = pipeline.generate_input_scenes(jax.random.key(0), 3,
                                                use_augmentation=False)
        np.testing.assert_allclose(np.asarray(scenes.light_color), 30.0)
        # view distances fixed at 2.75 for hemisphere scenes
        d = np.linalg.norm(np.asarray(scenes.camera_pos[1:]), axis=-1)
        np.testing.assert_allclose(d, 2.75, rtol=1e-5)

    def test_first_scene_overhead(self):
        scenes = pipeline.generate_input_scenes(jax.random.key(1), 4)
        light0 = np.asarray(scenes.light_pos[0])
        assert abs(light0[2] - pipeline.FIXED_LIGHT_DISTANCE) < 1e-5
        assert np.all(np.abs(light0[:2]) <= 0.75)


class TestDataset:
    def test_getitem_with_synthesis(self, toy_data_dir):
        ds = SvbrdfDataset(str(toy_data_dir / "train"), image_size=64,
                           scale_mode="crop", input_image_count=10,
                           used_input_image_count=3, use_augmentation=True)
        assert len(ds) == 2
        item = ds[0]
        assert item["inputs"].shape == (3, 64, 64, 3)
        assert item["svbrdf"].shape == (64, 64, 12)

    def test_getitem_all_synthesized(self, toy_data_dir):
        """image_count=10 but we ask for more than stored -> synth fills."""
        ds = SvbrdfDataset(str(toy_data_dir / "train"), image_size=32,
                           scale_mode="crop", input_image_count=10,
                           used_input_image_count=12)
        item = ds[0]
        assert item["inputs"].shape == (12, 32, 32, 3)

    def test_raw_batch_with_mixing(self, toy_data_dir):
        ds = SvbrdfDataset(str(toy_data_dir / "train"), image_size=32,
                           scale_mode="crop", input_image_count=0,
                           used_input_image_count=1, mix_materials=True)
        # input_image_count=0 means the strip IS the svbrdf-only layout —
        # the toy strips have 10 photos, so emulate by slicing; just check
        # the batching/mixing plumbing with what we have.
        batch = ds.raw_batch([0, 1])
        assert "partner_svbrdf" in batch
        assert batch["svbrdf"].shape[0] == 2

    def test_split_fractions(self):
        tr, va = split_train_validation(200, 0.01)
        assert len(tr) == 198 and len(va) == 2
        assert set(tr) | set(va) == set(range(200))

    def test_no_svbrdf_mode_getitem(self, toy_data_dir):
        """Photo-folder mode (c): dummy flat maps, real photos kept."""
        ds = SvbrdfDataset(str(toy_data_dir / "test"), image_size=32,
                           scale_mode="crop", input_image_count=14,
                           used_input_image_count=2, no_svbrdf=True)
        item = ds[0]
        assert item["inputs"].shape == (2, 32, 32, 3)
        np.testing.assert_allclose(item["svbrdf"][..., 2], 1.0)  # flat z

    def test_resize_mode_getitem(self, toy_data_dir):
        ds = SvbrdfDataset(str(toy_data_dir / "train"), image_size=64,
                           scale_mode="resize", input_image_count=10,
                           used_input_image_count=1)
        item = ds[0]
        assert item["inputs"].shape == (1, 64, 64, 3)
        assert item["svbrdf"].shape == (64, 64, 12)

    def test_strip_cache_hits(self, toy_data_dir):
        ds = SvbrdfDataset(str(toy_data_dir / "train"), image_size=32,
                           scale_mode="crop", input_image_count=10,
                           used_input_image_count=1)
        a = ds._read_strip_u8(0)
        assert ds._cache_used == a.nbytes
        b = ds._read_strip_u8(0)
        assert b is a  # second read served from cache

    def test_strip_cache_disabled(self, toy_data_dir):
        ds = SvbrdfDataset(str(toy_data_dir / "train"), image_size=32,
                           scale_mode="crop", input_image_count=10,
                           used_input_image_count=1, cache_bytes=0)
        ds._read_strip_u8(0)
        assert ds._cache_used == 0

    def test_shard_files_for_host(self):
        from svbrdf_tpu.data.dataset import shard_files_for_host

        paths = [f"f{i:03d}.png" for i in range(10)]
        s0 = shard_files_for_host(paths, 0, 3)
        s1 = shard_files_for_host(paths, 1, 3)
        s2 = shard_files_for_host(paths, 2, 3)
        assert sorted(s0 + s1 + s2) == sorted(paths)
        assert not (set(s0) & set(s1))
        assert len(s0) == 4 and len(s1) == 3
