"""Codec contracts — ports of the reference's embedded unittest suite
(reference utils.py:149-247) plus encoded-layout cases the reference left
as stubs (utils.py:197-199,225-227,241-243)."""

import jax.numpy as jnp
import numpy as np
import pytest

from svbrdf_tpu.ops import codecs

MAGIC_PIXEL = 1.3703509847201  # gamma_encode(2.0), reference utils.py:155


class TestGamma:
    def test_decode_single(self):
        img = jnp.full((1, 1, 2), MAGIC_PIXEL)
        np.testing.assert_allclose(codecs.gamma_decode(img), 2.0, rtol=1e-5)

    def test_decode_batch(self):
        img = jnp.full((5, 1, 1, 2), MAGIC_PIXEL)
        np.testing.assert_allclose(codecs.gamma_decode(img), 2.0, rtol=1e-5)

    def test_encode_single(self):
        img = jnp.full((1, 1, 2), 2.0)
        np.testing.assert_allclose(
            codecs.gamma_encode(img), MAGIC_PIXEL, rtol=1e-5)

    def test_encode_roundtrip(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (4, 8, 3)).astype(np.float32))
        np.testing.assert_allclose(
            codecs.gamma_decode(codecs.gamma_encode(img)), img, atol=1e-5)


def _maps(batch=()):
    n = np.full(batch + (1, 1, 3), 1.0 / np.sqrt(3.0), np.float32)
    d = np.broadcast_to(np.array([0.1, 0.2, 0.3], np.float32),
                        batch + (1, 1, 3))
    r = np.full(batch + (1, 1, 3), 0.3, np.float32)
    s = np.broadcast_to(np.array([0.4, 0.5, 0.6], np.float32),
                        batch + (1, 1, 3))
    return jnp.asarray(n), jnp.asarray(d), jnp.asarray(r), jnp.asarray(s)


class TestPacking:
    def test_pack_single(self):
        n, d, r, s = _maps()
        svbrdf = codecs.pack_svbrdf(n, d, r, s)
        assert svbrdf.shape == (1, 1, 12)
        np.testing.assert_allclose(svbrdf[..., 0:3], n)
        np.testing.assert_allclose(svbrdf[..., 3:6], d)
        np.testing.assert_allclose(svbrdf[..., 6:9], r)
        np.testing.assert_allclose(svbrdf[..., 9:12], s)

    def test_pack_batch(self):
        n, d, r, s = _maps(batch=(5,))
        svbrdf = codecs.pack_svbrdf(n, d, r, s)
        assert svbrdf.shape == (5, 1, 1, 12)

    def test_unpack_single(self):
        n, d, r, s = _maps()
        un = codecs.unpack_svbrdf(codecs.pack_svbrdf(n, d, r, s))
        np.testing.assert_allclose(un.normals, n)
        np.testing.assert_allclose(un.diffuse, d)
        np.testing.assert_allclose(un.roughness, r)
        np.testing.assert_allclose(un.specular, s)

    def test_unpack_batch(self):
        n, d, r, s = _maps(batch=(5,))
        un = codecs.unpack_svbrdf(codecs.pack_svbrdf(n, d, r, s))
        assert un.diffuse.shape == (5, 1, 1, 3)
        np.testing.assert_allclose(un.specular, s)

    def test_unpack_encoded(self):
        # 9-channel layout: [nx ny | d3 | r1 | s3]
        sv9 = jnp.asarray(np.arange(9, dtype=np.float32)[None, None, :])
        un = codecs.unpack_svbrdf(sv9, is_encoded=True)
        assert un.normals.shape[-1] == 2
        assert un.roughness.shape[-1] == 1
        np.testing.assert_allclose(un.normals[0, 0], [0.0, 1.0])
        np.testing.assert_allclose(un.roughness[0, 0], [5.0])


class TestDecodeSvbrdf:
    def test_normal_reconstruction(self):
        sv9 = np.zeros((2, 2, 9), np.float32)
        sv9[..., 0] = 0.1   # nx
        sv9[..., 1] = -0.2  # ny
        sv9[..., 5] = 0.7   # roughness
        out = codecs.decode_svbrdf(jnp.asarray(sv9))
        assert out.shape == (2, 2, 12)
        n = np.asarray(out[..., 0:3])
        # normals = normalize([3*nx, 3*ny, 1])
        expected = np.array([0.3, -0.6, 1.0])
        expected = expected / np.linalg.norm(expected)
        np.testing.assert_allclose(n[0, 0], expected, rtol=1e-5)
        # unit length everywhere
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
        # roughness replicated to 3 channels
        np.testing.assert_allclose(out[..., 6:9], 0.7, rtol=1e-6)

    def test_matches_reference(self, reference_modules):
        import torch
        ref_utils = reference_modules["utils"]
        rng = np.random.default_rng(7)
        sv9 = rng.uniform(-1, 1, (3, 4, 4, 9)).astype(np.float32)
        ours = np.asarray(codecs.decode_svbrdf(jnp.asarray(sv9)))
        theirs = ref_utils.decode_svbrdf(
            torch.from_numpy(sv9).permute(0, 3, 1, 2))
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestEncodeSvbrdf:
    def test_roundtrip_with_decode(self):
        """decode(encode(x)) == x (the reference's encode was broken and
        raised NotImplementedError, utils.py:62-63)."""
        rng = np.random.default_rng(11)
        n = rng.uniform(-1, 1, (4, 4, 3)).astype(np.float32)
        n[..., 2] = np.abs(n[..., 2]) + 0.4
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        d = rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)
        r = np.repeat(rng.uniform(0, 1, (4, 4, 1)).astype(np.float32), 3, -1)
        s = rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)
        sv = jnp.asarray(np.concatenate([n, d, r, s], -1))
        back = codecs.decode_svbrdf(codecs.encode_svbrdf(sv))
        np.testing.assert_allclose(np.asarray(back), np.asarray(sv),
                                   atol=1e-5)


class TestUnitInterval:
    def test_roundtrip(self):
        x = jnp.linspace(-1, 1, 11)
        np.testing.assert_allclose(
            codecs.decode_from_unit_interval(codecs.encode_as_unit_interval(x)),
            x, atol=1e-7)


class TestCropSquare:
    def test_3d(self):
        x = jnp.arange(5 * 6 * 2, dtype=jnp.float32).reshape(5, 6, 2)
        out = codecs.crop_square(x, (1, 2), 3)
        np.testing.assert_allclose(out, np.asarray(x)[1:4, 2:5, :])

    def test_4d(self):
        x = jnp.arange(2 * 5 * 6 * 2, dtype=jnp.float32).reshape(2, 5, 6, 2)
        out = codecs.crop_square(x, (0, 1), 4)
        np.testing.assert_allclose(out, np.asarray(x)[:, 0:4, 1:5, :])
