"""Training-infrastructure tests: checkpoint roundtrip + restore-args
semantics, TensorBoard writer wire format, sharded step parity, and the
multi-chip dry run."""

import json
import struct

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from svbrdf_tpu.training.checkpoint import Checkpoint
from svbrdf_tpu.training.tensorboard import SummaryWriter, _masked_crc


class TestCheckpoint:
    def _tree(self):
        return {
            "params": {"dense": {"kernel": jnp.ones((3, 4)),
                                 "bias": jnp.zeros((4,))}},
        }

    def test_roundtrip(self, tmp_path):
        tree = self._tree()
        opt = optax.adam(1e-3)
        opt_state = opt.init(tree["params"])
        Checkpoint.save(tmp_path / "ckpt", tree["params"], opt_state,
                        epoch=7, model_type="single", use_coords=True)
        ck = Checkpoint.load(tmp_path / "ckpt")
        assert ck.is_valid()
        restored = ck.restore_params(None)
        np.testing.assert_array_equal(
            np.asarray(restored["dense"]["kernel"]), np.ones((3, 4)))
        assert ck.restore_epoch(0) == 7
        ro = ck.restore_opt_state(None)
        assert ro is not None

    def test_restore_args_override(self, tmp_path):
        import argparse

        Checkpoint.save(tmp_path / "ckpt", self._tree()["params"], None,
                        epoch=1, model_type="multi", use_coords=True)
        ck = Checkpoint.load(tmp_path / "ckpt")
        args = argparse.Namespace(model_type="single", use_coords=False)
        args = ck.restore_args(args)
        assert args.model_type == "multi"
        assert args.use_coords is True

    def test_omit_optimizer_state(self, tmp_path):
        Checkpoint.save(tmp_path / "ckpt", self._tree()["params"],
                        {"something": jnp.ones(2)}, epoch=0,
                        model_type="single", use_coords=False,
                        omit_optimizer_state=True)
        ck = Checkpoint.load(tmp_path / "ckpt")
        sentinel = object()
        assert ck.restore_opt_state(sentinel) is sentinel

    def test_missing_checkpoint_is_invalid(self, tmp_path):
        ck = Checkpoint.load(tmp_path / "nope")
        assert not ck.is_valid()


class TestTensorBoardWriter:
    def _read_records(self, path):
        records = []
        with open(path, "rb") as f:
            while True:
                header = f.read(8)
                if len(header) < 8:
                    break
                (length,) = struct.unpack("<Q", header)
                (hcrc,) = struct.unpack("<I", f.read(4))
                assert hcrc == _masked_crc(header)
                payload = f.read(length)
                (pcrc,) = struct.unpack("<I", f.read(4))
                assert pcrc == _masked_crc(payload)
                records.append(payload)
        return records

    def test_scalar_records(self, tmp_path):
        w = SummaryWriter(str(tmp_path / "logs"))
        w.add_scalar("loss", 1.5, 0)
        w.add_scalar("loss", 0.75, 1)
        w.close()

        files = list((tmp_path / "logs").iterdir())
        assert len(files) == 1
        records = self._read_records(files[0])
        assert len(records) == 3  # file_version + 2 scalars
        assert b"brain.Event" in records[0]
        assert b"loss" in records[1]
        # simple_value 0.75 appears as little-endian f32 in record 2
        assert struct.pack("<f", 0.75) in records[2]


@pytest.mark.slow
class TestShardedStep:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        assert len(jax.devices()) >= 8
        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (1, 256, 256, 12)


class TestLoopHelpers:
    def test_loss_kind_mapping(self):
        from svbrdf_tpu.training.loop import _loss_kind

        assert _loss_kind("mixed") == "mixed"
        assert _loss_kind("render") == "rendering"
        assert _loss_kind("l1") == "l1"
