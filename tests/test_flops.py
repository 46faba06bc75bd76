"""Sanity checks for the analytic FLOP model behind the MFU report."""

from svbrdf_tpu.utils import flops


def test_generator_flops_scale():
    naive = flops.generator_forward_flops(folded_decoder=False)
    folded = flops.generator_forward_flops(folded_decoder=True)
    # Folding removes the upsample redundancy of decoder conv1 (9/16 of
    # those MACs); overall ~31% of the generator forward.
    assert folded < naive
    assert 0.6 < folded / naive < 0.8
    # Order of magnitude: the 256^2 U-Net is tens of GFLOP per image.
    assert 20e9 < folded < 60e9


def test_train_step_flops_batch_linear():
    f1 = flops.train_step_flops(batch=1)
    f8 = flops.train_step_flops(batch=8)
    assert f8 == 8 * f1


def test_mfu_bounds():
    # 14.7 ms measured step => MFU in a plausible (0, 1) range.
    m = flops.mfu(14.7e-3)
    assert 0.05 < m < 1.0
