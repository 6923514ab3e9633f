"""Native image preprocessing (csrc/mm_preproc.cpp) parity vs PIL.

The native resampler replicates PIL's 8bpc fixed-point pipeline
(ref rust/sglang-mm's role: preprocessing off the Python hot path),
so resize must be byte-identical to PIL and normalize exact vs numpy.
"""

import numpy as np
import pytest

from sglang_tpu.multimodal import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native mm lib unavailable"
)


def _pil(arr, size_hw, resample):
    from PIL import Image

    img = Image.fromarray(arr)
    return np.asarray(
        img.resize((size_hw[1], size_hw[0]), resample), np.uint8
    )


@pytest.mark.parametrize("shape,out_hw", [
    ((64, 48), (224, 224)),     # upscale
    ((480, 640), (224, 224)),   # downscale
    ((224, 224), (224, 224)),   # identity
    ((17, 31), (100, 50)),      # odd sizes
    ((300, 100), (100, 300)),   # mixed up/down
])
@pytest.mark.parametrize("filt", ["bicubic", "bilinear"])
def test_resize_matches_pil(shape, out_hw, filt):
    from PIL import Image

    rng = np.random.default_rng(hash((shape, out_hw, filt)) % 2**31)
    arr = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    want = _pil(
        arr, out_hw,
        Image.BICUBIC if filt == "bicubic" else Image.BILINEAR,
    )
    got = native.resize_u8(
        arr, out_hw,
        native.FILTER_BICUBIC if filt == "bicubic"
        else native.FILTER_BILINEAR,
    )
    assert got is not None
    np.testing.assert_array_equal(got, want)


def test_resize_grayscale():
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(50, 70), dtype=np.uint8)
    want = np.asarray(
        Image.fromarray(arr).resize((32, 40), Image.BICUBIC), np.uint8
    )
    got = native.resize_u8(arr, (40, 32), native.FILTER_BICUBIC)
    assert got is not None
    np.testing.assert_array_equal(got[:, :, 0], want)


def test_normalize_chw():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    mean = np.array([0.481, 0.457, 0.408], np.float32)
    std = np.array([0.268, 0.261, 0.275], np.float32)
    got = native.normalize_chw(arr, mean, std)
    want = ((arr.astype(np.float32) / 255.0 - mean) / std).transpose(2, 0, 1)
    assert got is not None
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_processor_path_uses_native():
    """LLaVA processor end-to-end remains HF-exact with native enabled."""
    from PIL import Image

    from sglang_tpu.multimodal.processors import _resize, _to_chw_norm

    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, size=(90, 120, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    out = _resize(img, (64, 80))
    want = img.resize((80, 64), Image.BICUBIC)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    norm = _to_chw_norm(out)
    assert norm.shape == (3, 64, 80)
