"""DeviceDataCache: HBM-resident batches equal the host pipeline's."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svbrdf_tpu.data.dataset import SvbrdfDataset
from svbrdf_tpu.data.device_cache import DeviceDataCache


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from svbrdf_tpu.data import toy

    d = tmp_path_factory.mktemp("dc") / "data"
    toy.generate_toy_dataset(str(d), n_train=5, n_test=0, size=32,
                             n_inputs=2, seed=9)
    return d / "train"


def _dataset(corpus, **kw):
    kw.setdefault("input_image_count", 2)
    kw.setdefault("used_input_image_count", 1)
    return SvbrdfDataset(data_directory=str(corpus), image_size=32,
                         seed=11, **kw)


def test_batches_match_host_pipeline(corpus):
    host = _dataset(corpus)
    cached = DeviceDataCache(_dataset(corpus))
    idx = [3, 0, 4]
    a = host.raw_batch(idx)
    b = cached.raw_batch(idx)
    # The cache additionally serves the pre-transposed planes store.
    assert set(b) == set(a) | {"svbrdf_planes"}
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert np.asarray(b[k]).dtype == np.uint8


def test_planes_store_matches_transpose(corpus):
    from svbrdf_tpu.data.pipeline import _to_phase_planes_any

    cached = DeviceDataCache(_dataset(corpus))
    b = cached.raw_batch([0, 2])
    want = _to_phase_planes_any(jnp.asarray(b["svbrdf"]))
    np.testing.assert_array_equal(np.asarray(b["svbrdf_planes"]),
                                  np.asarray(want))
    assert np.asarray(b["svbrdf_planes"]).dtype == np.uint8


def test_partner_planes_match_partner(corpus):
    kw = dict(mix_materials=True, input_image_count=0,
              used_input_image_count=1)
    from svbrdf_tpu.data.pipeline import _to_phase_planes_any

    cached = DeviceDataCache(_dataset(corpus, **kw))
    b = cached.raw_batch([1, 3])
    want = _to_phase_planes_any(jnp.asarray(b["partner_svbrdf"]))
    np.testing.assert_array_equal(np.asarray(b["partner_svbrdf_planes"]),
                                  np.asarray(want))


def test_mixing_partners_match_host_rng(corpus):
    host = _dataset(corpus, mix_materials=True, input_image_count=0,
                    used_input_image_count=1)
    cached = DeviceDataCache(
        _dataset(corpus, mix_materials=True, input_image_count=0,
                 used_input_image_count=1))
    idx = [1, 2]
    a = host.raw_batch(idx)
    b = cached.raw_batch(idx)
    np.testing.assert_array_equal(np.asarray(a["partner_svbrdf"]),
                                  np.asarray(b["partner_svbrdf"]))


def test_raw_batch_many_matches_sequential(corpus):
    """raw_batch_many (the K-step scan feed) equals K sequential
    raw_batch calls, including the mixing-partner RNG stream."""
    kw = dict(mix_materials=True, input_image_count=0,
              used_input_image_count=1)
    seq = DeviceDataCache(_dataset(corpus, **kw))
    many = DeviceDataCache(_dataset(corpus, **kw))
    rows = [[1, 2], [0, 4], [3, 3]]
    singles = [seq.raw_batch(r) for r in rows]
    stacked = many.raw_batch_many(np.asarray(rows))
    assert set(stacked) == set(singles[0])
    for k in stacked:
        got = np.asarray(stacked[k])
        assert got.shape[0] == len(rows)
        for j, s in enumerate(singles):
            np.testing.assert_array_equal(got[j], np.asarray(s[k]))


def test_rejects_random_crop_and_float_path(corpus):
    with pytest.raises(ValueError, match="random crops"):
        DeviceDataCache(_dataset(corpus, random_crop=True))
    with pytest.raises(ValueError, match="uint8"):
        DeviceDataCache(_dataset(corpus, scale_mode="resize"))


def test_rejects_oversized_dataset(corpus):
    with pytest.raises(ValueError, match="GB on device"):
        DeviceDataCache(_dataset(corpus), max_bytes=1024)


def test_chunked_remainder_step(tmp_path):
    """batch_count % steps_per_call == 1: the final chunk dispatches the
    SINGLE-step program, which takes a plain key and an unstacked batch.
    Regression: the scan-tuple key used to be passed through, raising
    'unexpected PRNG key type tuple' at the end of every epoch whose
    batch count wasn't a multiple of K (hit 192 steps into the 20k-step
    corpus run)."""
    from svbrdf_tpu.cli import parse_args
    from svbrdf_tpu.data import toy
    from svbrdf_tpu.training import loop

    d = tmp_path / "data"
    toy.generate_toy_dataset(str(d), n_train=6, n_test=0, size=16,
                             n_inputs=0, seed=5)
    args = parse_args([
        "--mode", "train", "--input-dir", str(d / "train"),
        "--image-count", "0", "--used-image-count", "1",
        "--image-size", "16", "--model-depth", "4", "--num-filters", "4",
        "--batch-size", "2", "--epochs", "1", "--save-frequency", "999",
        "--validation-frequency", "999",
        "--model-dir", str(tmp_path / "m"), "--retrain",
        "--device-data-cache", "--steps-per-call", "2",
    ])
    # 6 samples -> 5.94 -> 5 train? (1% validation) => batch_count 3:
    # chunks k=2 then k=1 (the remainder program under test).
    loss = loop.run_training(args)
    assert np.isfinite(loss)


def test_cli_training_with_device_cache(tmp_path, corpus):
    """End-to-end: --device-data-cache through run_training (the 20k-step
    corpus protocol's configuration, at toy scale)."""
    from svbrdf_tpu.cli import parse_args
    from svbrdf_tpu.training import loop

    args = parse_args([
        "--mode", "train", "--input-dir", str(corpus),
        "--image-count", "2", "--used-image-count", "1",
        "--image-size", "32", "--model-depth", "5", "--num-filters", "8",
        "--batch-size", "2", "--epochs", "1", "--save-frequency", "1",
        "--validation-frequency", "999",
        "--model-dir", str(tmp_path / "m"), "--retrain",
        "--device-data-cache",
    ])
    loss = loop.run_training(args)
    assert np.isfinite(loss)


test_cli_training_with_device_cache = pytest.mark.slow(
    test_cli_training_with_device_cache)
