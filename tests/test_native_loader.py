"""Native C++ loader tests: decode correctness vs PIL, prefetch pool."""

import numpy as np
import pytest
from PIL import Image

from svbrdf_tpu.data import native_loader, strips


@pytest.fixture(scope="module")
def native_lib():
    if not native_loader.native_available():
        pytest.skip("native loader not built")
    return native_loader.get_library()


def _pil(path):
    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def test_decode_matches_pil(native_lib, toy_data_dir):
    path = strips.list_sample_files(str(toy_data_dir / "train"))[0]
    np.testing.assert_array_equal(native_loader.decode_png_rgb8(path),
                                  _pil(path))


def test_prefetch_pool(native_lib, toy_data_dir):
    paths = (strips.list_sample_files(str(toy_data_dir / "train"))
             + strips.list_sample_files(str(toy_data_dir / "test")))
    pool = native_loader.PrefetchPool(paths, n_threads=2, capacity=4)
    try:
        for i in range(len(paths)):
            pool.request(i)
        for i in reversed(range(len(paths))):
            out = pool.take(i)
            np.testing.assert_array_equal(out, _pil(paths[i]))
    finally:
        pool.close()


def test_pool_capacity_one_no_deadlock(native_lib, toy_data_dir):
    """A demanded index must decode even when the ready cache is full of
    OTHER images (hint bursts beyond capacity are dropped, never queued
    unboundedly; demand enqueues bypass the capacity gate)."""
    paths = (strips.list_sample_files(str(toy_data_dir / "train"))
             + strips.list_sample_files(str(toy_data_dir / "test")))
    assert len(paths) >= 3
    pool = native_loader.PrefetchPool(paths, n_threads=1, capacity=1)
    try:
        for i in range(len(paths)):  # hint burst >> capacity
            pool.request(i)
        # Take in reverse: the ready slot holds index 0 while we demand
        # the last index — must not deadlock, and data must be right.
        for i in reversed(range(len(paths))):
            np.testing.assert_array_equal(pool.take(i), _pil(paths[i]))
    finally:
        pool.close()


def test_pool_bad_index(native_lib, toy_data_dir):
    paths = strips.list_sample_files(str(toy_data_dir / "train"))
    pool = native_loader.PrefetchPool(paths)
    try:
        with pytest.raises(RuntimeError):
            pool.take(999)
    finally:
        pool.close()


def test_read_image_uses_native(toy_data_dir):
    path = strips.list_sample_files(str(toy_data_dir / "train"))[0]
    img = strips.read_image(path)
    assert img.dtype == np.float32
    assert img.shape == (256, 3584, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0
