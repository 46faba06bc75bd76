"""Viz tests: homography vs OpenCV, warp correctness, comparison grids."""

import numpy as np
import pytest

from svbrdf_tpu import viz


def test_find_homography_maps_points():
    src = np.array([[0, 0], [0, 10], [10, 10], [10, 0]], np.float64)
    dst = np.array([[1, 2], [0, 12], [13, 11], [11, -1]], np.float64)
    H = viz.find_homography(src, dst)
    pts = np.concatenate([src, np.ones((4, 1))], axis=1)
    proj = pts @ H.T
    proj = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(proj, dst, atol=1e-8)


def test_find_homography_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    src = np.array([[0, 0], [0, 256], [256, 256], [256, 0]], np.float32)
    dst = np.array([[30, 40], [10, 200], [240, 230], [220, 20]], np.float32)
    ours = viz.find_homography(src.astype(np.float64),
                               dst.astype(np.float64))
    theirs, _ = cv2.findHomography(src, dst)
    np.testing.assert_allclose(ours / ours[2, 2], theirs / theirs[2, 2],
                               rtol=1e-6)


def test_warp_perspective_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    out = viz.warp_perspective(img, np.eye(3), (16, 16))
    np.testing.assert_allclose(out[:15, :15], img[:15, :15], atol=1e-6)


def test_warp_perspective_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    mapping = viz.OrthoToPerspectiveMapping([0.0, -1.0, 2.0], (48, 48))
    H = mapping.get_homography((32, 32))
    ours = mapping.apply(img)
    theirs = cv2.warpPerspective(img, H.astype(np.float32), dsize=(48, 48))
    # interiors agree; border handling differs slightly
    mask = theirs > 1e-6
    diff = np.abs(ours - theirs)[mask]
    assert np.percentile(diff, 95) < 0.06


def test_ortho_to_perspective_identity_at_t0():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    mapping = viz.OrthoToPerspectiveMapping([0.0, 0.0, 2.0], (16, 16))
    out = mapping.apply(img, t=0.0)
    np.testing.assert_allclose(out[:15, :15], img[:15, :15], atol=1e-6)


def test_save_comparison_grid(tmp_path):
    rng = np.random.default_rng(3)
    inp = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, (8, 8, 12)).astype(np.float32)
    pred = rng.uniform(0, 1, (8, 8, 12)).astype(np.float32)
    path = tmp_path / "grid.png"
    viz.save_comparison_grid(str(path), inp, gt, pred)
    assert path.exists()
    from PIL import Image

    im = Image.open(path)
    assert im.size == (5 * 8, 2 * 8)
