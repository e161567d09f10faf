"""Host<->device transfer helpers (complex carried as f32 pairs)."""

import numpy as np

from tron_tpu.utils.xfer import to_device, to_host


def test_complex_roundtrip(rng):
    for shape in [(8,), (3, 5), (2, 3, 4), (1, 1, 8, 8, 1)]:
        x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
            np.complex64
        )
        a = to_device(x)
        assert a.shape == x.shape and a.dtype == np.complex64
        np.testing.assert_array_equal(to_host(a), x)


def test_real_roundtrip(rng):
    x = rng.standard_normal((4, 4)).astype(np.float32)
    np.testing.assert_array_equal(to_host(to_device(x)), x)
    x64 = rng.standard_normal((4,))
    assert to_device(x64).dtype == np.float32


def test_complex128_downcast(rng):
    x = (rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3)))
    a = to_device(x)
    assert a.dtype == np.complex64
    np.testing.assert_allclose(to_host(a), x.astype(np.complex64))
