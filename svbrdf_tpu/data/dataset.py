"""SvbrdfDataset: host I/O orchestration over the strip format.

Capability contract = reference dataset.py:11-220 (SvbrdfDataset), covering
its three input modes:
  (a) multi-view strips  [N photos + 4 maps]          (input_image_count=N)
  (b) SVBRDF-only strips with on-the-fly input render (input_image_count=0)
  (c) photograph folders without maps                 (no_svbrdf=True)

Split of responsibilities (TPU-native, unlike the reference's CPU worker
pipeline): the host decodes PNGs and picks random *indices* (shuffle,
mixing partners, crop anchors); all math — mixing, gamma decode, bilinear
resize, input synthesis, noise — is jax code from data/pipeline.py that the
training loop runs on device inside the jitted step.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from svbrdf_tpu.data import pipeline, strips


class SvbrdfDataset:
    def __init__(self, data_directory: str, image_size: int = 256,
                 scale_mode: str = "crop", input_image_count: int = 0,
                 used_input_image_count: int = 1,
                 use_augmentation: bool = True,
                 mix_materials: bool = False, no_svbrdf: bool = False,
                 is_linear: bool = False, random_crop: bool = False,
                 seed: int = 313, use_native_prefetch: bool = True,
                 prefetch_threads: int = 2,
                 cache_bytes: int = 1 << 30,
                 shard_across_hosts: bool = False):
        self.data_directory = data_directory
        self.file_paths: List[str] = strips.list_sample_files(data_directory)
        self.global_file_count = len(self.file_paths)
        if shard_across_hosts and jax.process_count() > 1:
            # Multi-host input pipeline: each process reads only its own
            # file shard; the global batch is assembled from per-process
            # slices (parallel/mesh.shard_batch). Seed folds in the
            # process index so hosts draw independent crops/partners.
            self.file_paths = shard_files_for_host(self.file_paths)
            seed = seed * 1000 + jax.process_index()
            print(f"Host {jax.process_index()}/{jax.process_count()}: "
                  f"{len(self.file_paths)} of {self.global_file_count} "
                  f"files")
        self.image_size = image_size
        self.scale_mode = scale_mode
        self.input_image_count = input_image_count
        self.used_input_image_count = used_input_image_count
        self.use_augmentation = use_augmentation
        # Mixing is only defined for map-only datasets (reference
        # dataset.py:29-31).
        self.mix_materials = mix_materials and input_image_count == 0
        if mix_materials and input_image_count > 0:
            print("Warning: material mixing requires a dataset without "
                  "input images; disabled.")
        self.no_svbrdf = no_svbrdf
        self.is_linear = is_linear
        self.random_crop = random_crop

        self._host_rng = np.random.default_rng(seed)
        self._key = jax.random.key(seed)

        # Byte-transfer fast path: in crop mode (pure slicing) the host can
        # keep strips as uint8 end-to-end; /255 + normals remap happen on
        # device (pipeline.prepare_batch), quartering host->device traffic.
        self._transfer_u8 = (scale_mode == "crop" and not no_svbrdf)

        # Decoded-sample cache (uint8, FIFO-bounded): repeat epochs over a
        # dataset that fits in host RAM (the ~1 GB multi-view corpus does)
        # skip PNG decode entirely. With a deterministic crop anchor the
        # cache holds the POST-SLICE (inputs, svbrdf) tiles — contiguous
        # arrays that batch-assembly can memcpy straight out of (measured
        # 196 -> >500 samples/s warm on a 1-core host vs re-slicing the
        # full strip per access); random_crop caches the full strip so
        # fresh anchors still see all pixels. The 80 GB single-view corpus
        # streams through the prefetch pool instead.
        self._cache_limit = max(0, cache_bytes)
        self._cache: "dict[int, np.ndarray]" = {}
        self._scaled_cache: "dict[int, tuple]" = {}
        self._cache_used = 0

        # Native libpng decode pool: big datasets (the 80 GB single-view
        # corpus) stream through background threads instead of stalling the
        # training loop on host PNG decode (the reference pays this cost in
        # DataLoader workers; SURVEY.md §3.3).
        self._pool = None
        if use_native_prefetch and self.file_paths:
            try:
                from svbrdf_tpu.data import native_loader

                if native_loader.native_available():
                    self._pool = native_loader.PrefetchPool(
                        self.file_paths, n_threads=prefetch_threads,
                        capacity=max(32, prefetch_threads * 8))
            except Exception:
                self._pool = None

    def __len__(self) -> int:
        return len(self.file_paths)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _crop_anchor(self, h: int, w: int):
        if self.scale_mode == "crop" and self.random_crop:
            return (int(self._host_rng.integers(0, h - self.image_size + 1)),
                    int(self._host_rng.integers(0, w - self.image_size + 1)))
        return (0, 0)

    def prefetch(self, indices) -> None:
        """Hint the decode pool about upcoming samples (no-op without it)."""
        if self._pool is not None:
            for i in indices:
                if (int(i) not in self._cache
                        and int(i) not in self._scaled_cache):
                    self._pool.request(int(i))

    def _read_strip_u8(self, idx: int, cache_strip: bool = True
                       ) -> np.ndarray:
        cached = self._cache.get(idx)
        if cached is not None:
            return cached
        if self._pool is not None:
            strip = self._pool.take(idx)
        else:
            strip = strips.read_image_u8(self.file_paths[idx])
        if (cache_strip
                and self._cache_used + strip.nbytes <= self._cache_limit):
            self._cache[idx] = strip
            self._cache_used += strip.nbytes
        return strip

    def _read_strip(self, idx: int) -> np.ndarray:
        return self._read_strip_u8(idx).astype(np.float32) / 255.0

    def load_scaled_u8(self, idx: int):
        """Byte fast path (crop mode): raw uint8 (inputs, svbrdf) tiles."""
        fixed_anchor = not self.random_crop
        if fixed_anchor:
            hit = self._scaled_cache.get(idx)
            if hit is not None:
                return hit
        inputs, svbrdf = strips.decode_strip_u8(
            self._read_strip_u8(idx, cache_strip=not fixed_anchor),
            self.input_image_count)
        n_read = min(self.input_image_count, self.used_input_image_count)
        inputs = inputs[self.input_image_count - n_read:]
        r, c = self._crop_anchor(svbrdf.shape[0], svbrdf.shape[1])
        s = self.image_size
        out = (inputs[:, r:r + s, c:c + s, :],
               svbrdf[r:r + s, c:c + s, :])
        if fixed_anchor:
            # Contiguous copies: drop the reference to the full strip and
            # let batch assembly memcpy instead of gather-stride.
            out = (np.ascontiguousarray(out[0]),
                   np.ascontiguousarray(out[1]))
            nbytes = out[0].nbytes + out[1].nbytes
            if self._cache_used + nbytes <= self._cache_limit:
                self._scaled_cache[idx] = out
                self._cache_used += nbytes
        return out

    def load_scaled(self, idx: int):
        """Host: strip -> scaled (inputs (N_read, s, s, 3), svbrdf (s, s, 12))."""
        if self._transfer_u8:
            return self.load_scaled_u8(idx)
        inputs, svbrdf = strips.decode_sample(
            self._read_strip(idx), self.input_image_count,
            self.used_input_image_count, self.no_svbrdf)
        anchor = self._crop_anchor(svbrdf.shape[0], svbrdf.shape[1])
        if inputs.shape[0] == 0:
            # crop_square/resize need >=1 leading image; scale svbrdf alone.
            _, svbrdf = pipeline.scale_sample(
                svbrdf[None], svbrdf, self.image_size, self.scale_mode,
                anchor)
            inputs = np.zeros((0,) + tuple(svbrdf.shape[:2]) + (3,),
                              np.float32)
        else:
            inputs, svbrdf = pipeline.scale_sample(
                inputs, svbrdf, self.image_size, self.scale_mode, anchor)
        return np.asarray(inputs), np.asarray(svbrdf)

    @staticmethod
    def _to_float(inputs: np.ndarray, svbrdf: np.ndarray):
        """Undo the uint8 fast path for eager per-item use."""
        if svbrdf.dtype == np.uint8:
            svf = svbrdf.astype(np.float32) / 255.0
            svbrdf = np.concatenate([svf[..., :3] * 2.0 - 1.0, svf[..., 3:]],
                                    axis=-1)
            inputs = inputs.astype(np.float32) / 255.0
        return inputs, svbrdf

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        """Fully-prepared single item (parity path; training uses batches()).

        Returns {'inputs': (used_count, s, s, 3) linear RGB,
                 'svbrdf': (s, s, 12)}. Reference dataset.py:45-103.
        """
        inputs, svbrdf = self._to_float(*self.load_scaled(idx))

        if self.mix_materials:
            other = int(self._host_rng.integers(0, len(self)))
            _, other_svbrdf = self._to_float(*self.load_scaled(other))
            svbrdf = np.asarray(pipeline.mix_materials(
                self._next_key(), svbrdf, other_svbrdf))

        inputs, svbrdf = pipeline.prepare_sample(
            self._next_key(), inputs, svbrdf,
            used_input_image_count=self.used_input_image_count,
            use_augmentation=self.use_augmentation,
            is_linear=self.is_linear)
        return {"inputs": np.asarray(inputs), "svbrdf": np.asarray(svbrdf)}

    # ------------------------------------------------------------------
    # Batched training path: host assembles raw arrays; device (jitted
    # caller) runs pipeline.prepare_batch.
    # ------------------------------------------------------------------
    def raw_batch(self, indices) -> Dict[str, np.ndarray]:
        """Stack scaled raw samples + mixing partners for device prep."""
        inputs, svbrdfs, partners = [], [], []
        for i in indices:
            x, s = self.load_scaled(int(i))
            inputs.append(x)
            svbrdfs.append(s)
            if self.mix_materials:
                j = int(self._host_rng.integers(0, len(self)))
                partners.append(self.load_scaled(j)[1])
        batch = {
            "inputs": np.stack(inputs),
            "svbrdf": np.stack(svbrdfs),
        }
        if self.mix_materials:
            batch["partner_svbrdf"] = np.stack(partners)
        return batch


def shard_files_for_host(paths, process_index: Optional[int] = None,
                         process_count: Optional[int] = None):
    """Deterministic per-host shard of a file list for multi-host training.

    For the ~200k-sample / 80 GB single-view corpus (SURVEY.md §6), each
    host feeds its own shard of files to its local devices; batch sharding
    across the global mesh handles the rest.
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [p for i, p in enumerate(sorted(paths)) if i % pc == pi]


def split_train_validation(dataset_len: int, validation_split: float = 0.01,
                           seed: int = 313):
    """Random 99/1 index split (reference main.py:57-59)."""
    import math

    n_train = int(math.ceil(dataset_len * (1.0 - validation_split)))
    order = np.random.default_rng(seed).permutation(dataset_len)
    return order[:n_train], order[n_train:]
