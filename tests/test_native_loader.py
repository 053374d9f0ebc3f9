import numpy as np
import pytest

from walkgpt_tpu.data import native_loader as nl
from walkgpt_tpu.data import transforms as T
from walkgpt_tpu.data.pave import PAVE_PIXEL_MEAN, PAVE_PIXEL_STD


@pytest.mark.skipif(not nl.available(), reason="native lib unavailable")
def test_native_resize_pil_byte_exact():
    rng = np.random.RandomState(0)
    img = (rng.rand(123, 211, 3) * 255).astype(np.uint8)
    for size in [(64, 110), (256, 439), (123, 211), (10, 17)]:
        ref = T._pil_resize(img, size)
        got = nl.resize_bilinear(img, size)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not nl.available(), reason="native lib unavailable")
def test_native_stream_matches_python_path():
    rng = np.random.RandomState(1)
    img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    resized = T.resize_longest_side(img, 128)
    ref = T.normalize_pad(resized, PAVE_PIXEL_MEAN, PAVE_PIXEL_STD, 128)
    got, hw = nl.preprocess_stream(img, 128, 128, PAVE_PIXEL_MEAN,
                                   PAVE_PIXEL_STD)
    assert hw == resized.shape[:2]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fallback_path_works(monkeypatch):
    """The PIL fallback must be exercised even when the native lib exists."""
    monkeypatch.setattr(nl, "load_library", lambda: None)
    rng = np.random.RandomState(2)
    img = (rng.rand(50, 60, 3) * 255).astype(np.uint8)
    out, hw = nl.preprocess_stream(img, 32, 32, PAVE_PIXEL_MEAN, PAVE_PIXEL_STD)
    assert out.shape == (32, 32, 3) and hw == (27, 32)
