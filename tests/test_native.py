"""Native C++ preprocessing: build, parity vs numpy/python reference, speed."""

import time

import numpy as np
import pytest

from paddlemix_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("no g++ / build failed")


def test_resize_normalize_parity(lib_ok):
    rng = np.random.RandomState(0)
    img = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
    mean, std = (0.5, 0.4, 0.3), (0.2, 0.25, 0.3)
    out = native.resize_normalize(img, (16, 24), mean, std)
    assert out.shape == (16, 24, 3)
    # identity-size resize matches plain normalize exactly
    same = native.resize_normalize(img, (37, 53), mean, std)
    ref = (img.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(same, ref, atol=1e-5)


def test_center_crop_parity(lib_ok):
    rng = np.random.RandomState(0)
    img = rng.rand(20, 30, 3).astype(np.float32)
    out = native.center_crop(img, (10, 12))
    np.testing.assert_allclose(out, img[5:15, 9:21], atol=0)


def test_extract_patches_parity(lib_ok):
    from paddlemix_tpu.processors.qwen2_vl_processing import extract_patches as py_extract

    rng = np.random.RandomState(0)
    img = rng.rand(16, 24, 3).astype(np.float32)
    ref, grid = py_extract(img, patch_size=4, merge_size=2, temporal_patch_size=2)
    out = native.extract_patches(img, patch_size=4, merge_size=2, temporal_patch_size=2)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_native_speed(lib_ok):
    rng = np.random.RandomState(0)
    img = (rng.rand(1080, 1920, 3) * 255).astype(np.uint8)
    mean = std = (0.5, 0.5, 0.5)
    t0 = time.perf_counter()
    for _ in range(3):
        native.resize_normalize(img, (336, 336), mean, std)
    t_native = (time.perf_counter() - t0) / 3
    # PIL reference path
    from paddlemix_tpu.processors.image_utils import normalize, resize

    t0 = time.perf_counter()
    for _ in range(3):
        normalize(resize(img, (336, 336), "bilinear").astype(np.float32) / 255.0, mean, std)
    t_pil = (time.perf_counter() - t0) / 3
    # native should not be dramatically slower (usually faster; PIL is C too)
    assert t_native < t_pil * 3, (t_native, t_pil)
