"""Port PyTorch reference checkpoints into our Flax parameter trees.

Lets users of the reference (mworchel/svbrdf-estimation) carry their
trained `checkpoint.tar` weights over (reference persistence.py:59-69
stores `model_state_dict`), and powers the bitwise-closeness parity tests
against the PyTorch model.

Layout conversions: torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O);
torch linear weight (O, I) -> flax (I, O). Module-path translation follows
the reference model tree (models.py:208-411) vs ours (models/generator.py).
"""

from __future__ import annotations

import re
from typing import Dict

import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def _torch_key(path) -> str:
    """Translate a flax param path to the reference state_dict key."""
    parts = [str(p) for p in path]
    leaf = parts.pop()
    segs = []
    i = 0
    while i < len(parts):
        s = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        if re.fullmatch(r"enc\d", s) or re.fullmatch(r"conv\d", s):
            # EncodingLayer/ConvFeatureLayer wrap an InterconnectedConvLayer
            # called `conv` (reference models.py:97,156).
            if nxt == "conv":
                segs += [s, "conv", "conv"]
                i += 2
            elif nxt == "norm":
                segs += [s, "conv", "norm"]
                i += 2
            elif nxt == "merge":
                segs += [s, "conv", "merge", "fully_connected"]
                i += 3  # skip 'merge', 'fc'
            else:
                segs.append(s)
                i += 1
        elif re.fullmatch(r"dec\d", s):
            # DecodingLayer wraps `deconv` whose conv is a Sequential:
            # [upsample, pad, conv, pad, conv] (reference models.py:119-126).
            if nxt == "conv1":
                segs += [s, "deconv", "conv", "2"]
                i += 2
            elif nxt == "conv2":
                segs += [s, "deconv", "conv", "4"]
                i += 2
            elif nxt == "norm":
                segs += [s, "deconv", "norm"]
                i += 2
            elif nxt == "merge":
                segs += [s, "deconv", "merge", "fully_connected"]
                i += 3
            else:
                segs.append(s)
                i += 1
        elif re.fullmatch(r"gte\d|gtd\d|gt\d", s):
            segs += [s, "fully_connected"]
            i += 2  # skip 'fc'
        elif s == "merge" and nxt == "fc":
            segs += ["merge", "fully_connected"]
            i += 2
        else:
            segs.append(s)
            i += 1

    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    return ".".join(segs + [suffix])


def export_torch_state_dict(flax_params) -> Dict:
    """Inverse of port_torch_state_dict: Flax params -> reference-layout
    state_dict (numpy arrays, torch key names/layouts).

    Lets models trained here be loaded by the PyTorch reference with a
    STRICT `model.load_state_dict(...)` (reference persistence.py:96-103):
    the reference's MergeLayer always creates its Linear even for enc1,
    where forward never applies it (global_track is None at enc1,
    reference models.py:41-45,284); our Flax Merge creates no parameter in
    that case, so the unused weight is synthesized as zeros — it is never
    read by the reference's forward and receives no gradient.
    """
    flat = traverse_util.flatten_dict(flax_params)
    out = {}
    for path, val in flat.items():
        # bf16-SR master checkpoints (parallel/step.master_dtype_policy)
        # store >=2-D leaves in bfloat16, which numpy/torch interop does
        # not round-trip — the reference expects f32 tensors.
        w = np.asarray(jnp.asarray(val).astype(jnp.float32))
        if path[-1] == "kernel" and w.ndim == 4:
            w = w.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif path[-1] == "kernel" and w.ndim == 2:
            w = w.T
        out[_torch_key(path)] = w
    for key in list(out):
        m = re.fullmatch(r"(.*\.)?enc1\.conv\.conv\.weight", key)
        if m:
            merge_key = ((m.group(1) or "")
                         + "enc1.conv.merge.fully_connected.weight")
            if merge_key not in out:
                c = out[key].shape[0]  # OIHW: enc1 output channel count
                out[merge_key] = np.zeros((c, c), np.float32)
    return out


def port_torch_state_dict(state_dict: Dict, flax_params) -> Dict:
    """Fill a flax param tree with reference torch weights.

    state_dict values may be torch tensors or numpy arrays. Raises KeyError
    / shape mismatch if the architectures disagree.
    """
    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    flat = traverse_util.flatten_dict(flax_params)
    out = {}
    for path, val in flat.items():
        w = to_np(state_dict[_torch_key(path)])
        if path[-1] == "kernel" and w.ndim == 4:
            w = w.transpose(2, 3, 1, 0)
        elif path[-1] == "kernel" and w.ndim == 2:
            w = w.T
        if w.shape != val.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(map(str, path))}: "
                f"torch {w.shape} vs flax {val.shape}")
        out[path] = jnp.asarray(w, jnp.float32)
    return traverse_util.unflatten_dict(out)
