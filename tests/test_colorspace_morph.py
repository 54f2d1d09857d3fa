"""Colorspace / morphology / warp / ssim parity vs OpenCV (and scipy)."""

import cv2
import numpy as np
import pytest

from nsof_tpu.ops import colorspace as CS
from nsof_tpu.ops import morphology as M
from nsof_tpu.ops import ssim as S
from nsof_tpu.ops import warp as W


def test_cart_to_polar(rng):
    fx = (rng.random((20, 20)) * 10 - 5).astype(np.float32)
    fy = (rng.random((20, 20)) * 10 - 5).astype(np.float32)
    mag_ref, ang_ref = cv2.cartToPolar(fx.astype(np.float64), fy.astype(np.float64))
    mag, ang = CS.cart_to_polar(fx, fy)
    np.testing.assert_allclose(np.asarray(mag), mag_ref, rtol=1e-5)
    # cv2 fastAtan2 accuracy ~0.3 degrees = 0.0053 rad
    d = np.abs(np.asarray(ang) - ang_ref)
    d = np.minimum(d, 2 * np.pi - d)
    assert d.max() < 0.01


def test_normalize_minmax(rng):
    x = rng.random((15, 17)).astype(np.float64) * 3
    ref = cv2.normalize(x, None, 0, 255, cv2.NORM_MINMAX)
    np.testing.assert_allclose(
        np.asarray(CS.normalize_minmax(x)), ref, atol=1e-3
    )
    const = np.full((5, 5), 2.0)
    np.testing.assert_allclose(np.asarray(CS.normalize_minmax(const)), 0.0)


def test_hsv_to_bgr(rng):
    hsv = np.zeros((64, 64, 3), np.uint8)
    hsv[..., 0] = rng.integers(0, 180, (64, 64))
    hsv[..., 1] = 255
    hsv[..., 2] = rng.integers(0, 256, (64, 64))
    ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    got = np.asarray(CS.hsv_to_bgr_u8(hsv))
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_bgr_to_gray_exact(rng):
    bgr = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    got = np.asarray(CS.bgr_to_gray_u8(bgr))
    np.testing.assert_array_equal(got, ref)


def test_rgb_to_gray_exact(rng):
    img = rng.integers(0, 256, (21, 19, 3)).astype(np.uint8)
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    got = np.asarray(CS.rgb_to_gray_u8(img))
    np.testing.assert_array_equal(got, ref)


def test_threshold_binary(rng):
    x = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    _, ref = cv2.threshold(x, 127, 256, cv2.THRESH_BINARY)
    np.testing.assert_array_equal(np.asarray(CS.threshold_binary(x, 127, 256)), ref)


@pytest.mark.parametrize("ksize", [(3, 3), (10, 10), (5, 7)])
def test_ellipse_se_matches_cv2(ksize):
    ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize[1], ksize[0]))
    got = M.ellipse_se(ksize[0], ksize[1])
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("ksize", [(3, 3), (10, 10)])
def test_dilate_erode_match_cv2(rng, ksize):
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize[1], ksize[0]))
    mask = (rng.random((40, 52)) > 0.8).astype(np.uint8) * 255
    np.testing.assert_array_equal(
        np.asarray(M.dilate_binary(mask, se)), cv2.dilate(mask, se)
    )
    np.testing.assert_array_equal(
        np.asarray(M.erode_binary(mask, se)), cv2.erode(mask, se)
    )


def test_seg_morphology_loop_matches_cv2(rng):
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (10, 10))
    mask = (rng.random((60, 80)) > 0.9).astype(np.uint8) * 255
    ref = mask.copy()
    for _ in range(5):
        ref = cv2.dilate(ref, se)
        ref = cv2.erode(ref, se)
    got = np.asarray(M.dilate_erode_n(mask, se, 5))
    np.testing.assert_array_equal(got, ref)


def test_morph_close_matches_cv2(rng):
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    mask = (rng.random((30, 30)) > 0.7).astype(np.uint8) * 255
    ref = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, se)
    np.testing.assert_array_equal(np.asarray(M.morph_close(mask, se)), ref)


def test_remap_bilinear_matches_cv2(rng):
    img = rng.integers(0, 256, (40, 50)).astype(np.uint8)
    mx = (rng.random((40, 50)) * 60 - 5).astype(np.float32)
    my = (rng.random((40, 50)) * 50 - 5).astype(np.float32)
    ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
    got = np.asarray(W.remap_bilinear(img, mx, my))
    # cv2 quantises fractions to 1/32 px → allow small intensity delta
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 4
    assert np.abs(got.astype(float) - ref.astype(float)).mean() < 1.0


def test_warp_by_flow_shifts_image():
    img = np.zeros((16, 16), np.float32)
    img[8, 8] = 1.0
    flow = np.zeros((16, 16, 2), np.float32)
    flow[..., 0] = 1.0  # sample at x+1 → image shifts left
    out = np.asarray(W.warp_by_flow(img, flow))
    assert out[8, 7] == pytest.approx(1.0)


def test_ssim_matches_skimage_formula(rng):
    # skimage unavailable in this env: oracle is a direct scipy
    # transliteration of its uniform-filter SSIM
    from scipy.ndimage import uniform_filter

    im1 = rng.integers(0, 256, (64, 64)).astype(np.float64)
    im2 = np.clip(im1 + rng.normal(0, 20, im1.shape), 0, 255)

    def skimage_ssim(x, y, data_range=255.0, win=7):
        NP = win**2
        cov_norm = NP / (NP - 1)
        f = lambda a: uniform_filter(a, size=win)
        ux, uy = f(x), f(y)
        uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        C1 = (0.01 * data_range) ** 2
        C2 = (0.03 * data_range) ** 2
        S_ = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux**2 + uy**2 + C1) * (vx + vy + C2)
        )
        pad = (win - 1) // 2
        return S_[pad:-pad, pad:-pad].mean()

    ref = skimage_ssim(im1, im2)
    got = float(S.ssim(im1, im2, 255.0))
    assert got == pytest.approx(ref, abs=2e-5)
