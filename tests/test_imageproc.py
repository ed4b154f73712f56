"""Native batched bicubic resize (native/imageproc.cpp) vs references."""

import numpy as np
import pytest

from vila_tpu.utils import imageproc


def test_native_lib_compiles_and_loads():
    assert imageproc._load_lib() is not None, "g++ build failed"


def test_resize_identity_and_shape():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 64, 80, 3), np.uint8)
    out = imageproc.resize_frames(frames, 48)
    assert out.shape == (3, 48, 48, 3) and out.dtype == np.uint8
    same = rng.integers(0, 255, (2, 48, 48, 3), np.uint8)
    assert imageproc.resize_frames(same, 48) is same


def test_resize_matches_cv2_cubic():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 96, 128, 3), np.uint8)
    got = imageproc.resize_frames(frames, 56)
    for i in range(2):
        ref = cv2.resize(frames[i], (56, 56), interpolation=cv2.INTER_CUBIC)
        diff = np.abs(got[i].astype(int) - ref.astype(int))
        # same kernel, different rounding order: tight agreement
        assert np.mean(diff) < 1.0 and np.percentile(diff, 99) <= 3, (
            np.mean(diff), diff.max(),
        )


def test_resize_constant_image_exact():
    frames = np.full((1, 70, 70, 3), 137, np.uint8)
    out = imageproc.resize_frames(frames, 33)
    assert (np.abs(out.astype(int) - 137) <= 1).all()


def test_pil_batch_mixed_sizes():
    from PIL import Image as PILImage

    rng = np.random.default_rng(2)
    frames = [
        PILImage.fromarray(rng.integers(0, 255, (60, 60, 3), np.uint8)),
        PILImage.fromarray(rng.integers(0, 255, (40, 90, 3), np.uint8)),
        PILImage.fromarray(rng.integers(0, 255, (60, 60, 3), np.uint8)),
    ]
    out = imageproc.resize_pil_batch(frames, 32)
    assert out.shape == (3, 32, 32, 3)
    # order preserved: frame 0 and 2 share a shape bucket but must land
    # back in their original slots
    single0 = imageproc.resize_frames(
        np.asarray(frames[0])[None], 32
    )[0]
    np.testing.assert_array_equal(out[0], single0)
