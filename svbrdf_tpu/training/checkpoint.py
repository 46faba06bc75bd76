"""Checkpoint persistence with the reference's restore semantics.

Capability contract = reference persistence.py:6-121 (Checkpoint):
  - one checkpoint directory holding model + optimizer + epoch + the two
    architecture-determining args (model_type, use_coords),
  - restored args OVERRIDE the CLI (reference persistence.py:78-94,
    main.py:26-27),
  - optional omission of optimizer state (reference cli.py:45-47),
  - selective restore helpers; loading is optional-by-default (a missing
    checkpoint is not an error except in test mode).

Storage is Orbax (async-capable, TPU-sharding-aware) for the param/opt
pytrees plus a JSON sidecar for scalar metadata — instead of a torch.save
tarball.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

META_FILE = "meta.json"
TREE_DIR = "state"


class Checkpoint:
    """An in-memory view of a loaded checkpoint (or an invalid one)."""

    def __init__(self, tree: Optional[Dict] = None,
                 meta: Optional[Dict] = None,
                 torch_state: Optional[Dict] = None):
        self._tree = tree
        self._meta = meta or {}
        self._torch_state = torch_state

    # -- loading --------------------------------------------------------
    @classmethod
    def load_torch(cls, path) -> "Checkpoint":
        """Ingest a PyTorch reference checkpoint.

        Accepts the reference's `checkpoint.tar` (torch.save dict with
        model_type/use_coords/epoch/model_state_dict, reference
        persistence.py:59-69), a bare `model.data` state-dict file with an
        optional `state.json` sidecar carrying the epoch (the legacy
        format, persistence.py:14-32), or a directory holding either.
        Weights are converted to our Flax layout on restore_params via
        interop.torch_port.
        """
        import torch

        p = pathlib.Path(path)
        if p.is_dir():
            if (p / "checkpoint.tar").exists():
                p = p / "checkpoint.tar"
            elif (p / "model.data").exists():
                p = p / "model.data"
            else:
                print(f"No torch checkpoint found in directory '{path}'")
                return cls(None)

        def _load(f):
            try:
                return torch.load(f, map_location="cpu", weights_only=True)
            except Exception:
                # Older torch.save pickles (e.g. containing plain python
                # objects) need the full unpickler.
                return torch.load(f, map_location="cpu", weights_only=False)

        blob = _load(p)
        meta: Dict[str, Any] = {}
        if isinstance(blob, dict) and "model_state_dict" in blob:
            state_dict = blob["model_state_dict"]
            # model_depth / num_filters are our architecture extensions;
            # genuine reference checkpoints lack them and get the
            # reference defaults (8 / 64).
            for k in ("model_type", "use_coords", "epoch",
                      "model_depth", "num_filters"):
                if k in blob:
                    meta[k] = blob[k]
        else:  # legacy: the file IS the state dict
            state_dict = blob
            sidecar = p.parent / "state.json"
            if sidecar.exists():
                meta["epoch"] = json.loads(sidecar.read_text())["epoch"]
                print("Loaded legacy training state")
            print("Loaded legacy model state")
        print(f"Loaded torch checkpoint '{p}'")
        return cls(None, meta, torch_state=state_dict)

    @classmethod
    def load(cls, checkpoint_dir, template: Optional[Dict] = None
             ) -> "Checkpoint":
        """Load from dir; returns an invalid Checkpoint when absent.

        `template` (a pytree of like-shaped arrays) enables exact dtype /
        sharding restoration; without it the stored tree is returned as-is.
        A directory holding a PyTorch reference checkpoint (checkpoint.tar
        or legacy model.data) instead of our Orbax state is ingested
        transparently, mirroring the reference's own legacy fallback
        (persistence.py:40-47).
        """
        d = pathlib.Path(checkpoint_dir)
        tree_path = d / TREE_DIR
        meta_path = d / META_FILE
        if not tree_path.exists():
            if ((d / "checkpoint.tar").exists()
                    or (d / "model.data").exists()):
                return cls.load_torch(d)
            print(f"No checkpoint found in directory '{checkpoint_dir}'")
            return cls(None)

        with ocp.PyTreeCheckpointer() as ckptr:
            if template is not None:
                restore_args = jax.tree.map(
                    lambda x: ocp.ArrayRestoreArgs(dtype=x.dtype), template)
                tree = ckptr.restore(
                    tree_path.resolve(),
                    args=ocp.args.PyTreeRestore(
                        item=template,
                        restore_args=restore_args))
            else:
                tree = ckptr.restore(tree_path.resolve())
        meta = {}
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
        return cls(tree, meta)

    # -- saving ---------------------------------------------------------
    @staticmethod
    def save(checkpoint_dir, params, opt_state, epoch: int,
             model_type: str, use_coords: bool,
             omit_optimizer_state: bool = False,
             extra_meta: Optional[Dict[str, Any]] = None) -> None:
        """Write {params[, opt_state]} + metadata. Reference persistence.py:52-69."""
        d = pathlib.Path(checkpoint_dir)
        d.mkdir(parents=True, exist_ok=True)

        from flax import serialization

        # Canonical storage form: flax state-dicts (pure nested dicts),
        # so optax NamedTuple/tuple structures survive the orbax roundtrip.
        tree = {"params": serialization.to_state_dict(params)}
        if not omit_optimizer_state and opt_state is not None:
            tree["opt_state"] = serialization.to_state_dict(opt_state)

        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save((d / TREE_DIR).resolve(), tree, force=True)

        if jax.process_index() != 0:
            return  # Orbax coordinated the array write; one meta sidecar
        meta = {
            "model_type": model_type,
            "use_coords": bool(use_coords),
            "epoch": int(epoch),
        }
        if extra_meta:
            meta.update(extra_meta)
        (d / META_FILE).write_text(json.dumps(meta, indent=2))

    # -- queries / selective restore ------------------------------------
    def is_valid(self) -> bool:
        return self._tree is not None or self._torch_state is not None

    def purge(self) -> None:
        """Drop the in-memory tree (reference persistence.py:71-73)."""
        self._tree = None
        self._torch_state = None

    def restore_args(self, args):
        """Architecture args in the checkpoint override the CLI.

        Reference persistence.py:78-94.
        """
        if "model_type" in self._meta:
            args.model_type = self._meta["model_type"]
            print(f"Restored model type '{args.model_type}'")
        if "use_coords" in self._meta:
            args.use_coords = self._meta["use_coords"]
            print(f"Restored use coords flag '{args.use_coords}'")
        # Architecture extensions beyond the reference's two flags.
        for extra in ("model_depth", "num_filters"):
            if extra in self._meta:
                setattr(args, extra, self._meta[extra])
        # Promoted config knobs (VERDICT r3 #7). Unlike the architecture
        # args above, an EXPLICIT CLI value beats the checkpoint here:
        # cross-policy restore is supported (master leaves re-cast,
        # upconv impls share the same 4x4 param layout), so the recorded
        # values only fill in when the CLI left the flag at 'auto'.
        for knob in ("master_dtype", "upconv"):
            if (knob in self._meta
                    and getattr(args, knob, "auto") in ("auto", None)):
                setattr(args, knob, self._meta[knob])
                print(f"Restored {knob} '{self._meta[knob]}'")
        return args

    def restore_params(self, params):
        """Fill `params` (template or None) from the stored state-dict."""
        if self._torch_state is not None:
            from svbrdf_tpu.interop import port_torch_state_dict

            if params is None:
                raise ValueError(
                    "restoring a torch checkpoint needs a parameter "
                    "template (build the model first)")
            ported = port_torch_state_dict(self._torch_state, params)
            print("Restored model state (ported from torch layout)")
            return ported
        if self._tree and "params" in self._tree:
            print("Restored model state")
            if params is None:
                return self._tree["params"]
            from flax import serialization

            restored = serialization.from_state_dict(params,
                                                     self._tree["params"])
            # Checkpoints written under a different master-dtype policy
            # (e.g. bf16-SR masters) restore cleanly into the template's
            # dtypes; the trainer re-applies its own policy afterwards
            # (training/loop.py master_cast).
            return jax.tree.map(lambda t, r: jnp.asarray(r, t.dtype),
                                params, restored)
        print("Failed to restore model state")
        return params

    def restore_opt_state(self, opt_state):
        """Fill `opt_state` (template or None) from the stored state-dict."""
        if self._torch_state is not None:
            # torch Adam moments are keyed by parameter *order*, which does
            # not survive the layout translation — start the optimizer
            # fresh rather than guessing a misaligned mapping.
            print("Torch checkpoints carry no portable optimizer state; "
                  "starting optimizer fresh")
            return opt_state
        if self._tree and "opt_state" in self._tree:
            print("Restored optimizer state")
            if opt_state is None:
                return self._tree["opt_state"]
            from flax import serialization

            restored = serialization.from_state_dict(
                opt_state, self._tree["opt_state"])
            # Checkpoints written before (or after) an optimizer-dtype
            # change restore cleanly: leaves are cast to the template's
            # dtype (e.g. f32 Adam moments -> the bf16 mu the current
            # make_optimizer uses, and vice versa).
            return jax.tree.map(lambda t, r: jnp.asarray(r, t.dtype),
                                opt_state, restored)
        print("Failed to restore optimizer state")
        return opt_state

    def restore_epoch(self, epoch: int) -> int:
        if "epoch" in self._meta:
            print(f"Restored epoch {self._meta['epoch']}")
            return int(self._meta["epoch"])
        print("Failed to restore epoch")
        return epoch
