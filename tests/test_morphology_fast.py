"""Batched lane-layout morphology: exact parity with the cv2-parity ops."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from nsof_tpu.ops import morphology_fast as mf


@pytest.mark.parametrize("ksize", [(3, 3), (10, 10), (5, 7)])
def test_hwb_morphology_matches_cv2(rng, ksize):
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize[1], ksize[0]))
    masks = rng.random((40, 52, 8)) > 0.85
    d_got = np.asarray(mf.dilate_binary_hwb(jnp.asarray(masks), se))
    e_got = np.asarray(mf.erode_binary_hwb(jnp.asarray(masks), se))
    for i in range(masks.shape[-1]):
        u8 = masks[:, :, i].astype(np.uint8) * 255
        np.testing.assert_array_equal(d_got[:, :, i], cv2.dilate(u8, se) > 0)
        np.testing.assert_array_equal(e_got[:, :, i], cv2.erode(u8, se) > 0)


def test_close_loop_matches_reference_head(rng):
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (10, 10))
    masks = rng.random((60, 80, 4)) > 0.9
    got = np.asarray(mf.dilate_erode_n_hwb(jnp.asarray(masks), se, 5))
    for i in range(4):
        ref = masks[:, :, i].astype(np.uint8) * 255
        for _ in range(5):
            ref = cv2.dilate(ref, se)
            ref = cv2.erode(ref, se)
        np.testing.assert_array_equal(got[:, :, i], ref > 0)


def test_batched_seg_head_matches_single(rng):
    """seg_head_window_batch ≡ vmapped seg_head_window."""
    import jax

    from nsof_tpu.config import DATASETS
    from nsof_tpu.pipelines.segmentation import (
        seg_head_window,
        seg_head_window_batch,
    )

    cfg = DATASETS["tabletennis"]
    flow = jnp.asarray(
        (rng.normal(size=(3, 48, 64, 2)) * 2).astype(np.float32)
    )
    inbox = jnp.asarray(rng.random((3, 48, 64)) > 0.2)
    ref = jax.vmap(lambda f, ib: seg_head_window(f, ib, cfg))(flow, inbox)
    got = seg_head_window_batch(flow, inbox, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("w", [52, 64, 96])
def test_packed_masked_loop_matches_unpacked(rng, w):
    """Bit-packed dilate∘erode chain ≡ the unpacked masked chain."""
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (10, 10))
    masks = jnp.asarray(rng.random((40, w, 8)) > 0.85)
    inbox = jnp.asarray(rng.random((40, w, 8)) > 0.15)
    got = np.asarray(mf.dilate_erode_n_masked_hwb(masks, inbox, se, 3))
    x = masks & inbox
    for _ in range(3):
        x = mf.dilate_binary_hwb(x & inbox, se)
        x = mf.erode_binary_hwb(x | ~inbox, se)
    ref = np.asarray(x & inbox)
    np.testing.assert_array_equal(got, ref)


def test_packed_shift_roundtrip(rng):
    x = jnp.asarray(rng.random((8, 96, 4)) > 0.5)
    p = mf._pack_w(x, 96)
    np.testing.assert_array_equal(np.asarray(mf._unpack_w(p, 96)), x)
    for s in (-37, -5, -1, 0, 1, 5, 31, 32, 40):
        shifted = np.asarray(mf._unpack_w(mf._shift_w_packed(p, s), 96))
        ref = np.zeros_like(np.asarray(x))
        src = np.asarray(x)
        if s >= 0:
            ref[:, : 96 - s] = src[:, s:]
        else:
            ref[:, -s:] = src[: , : 96 + s]
        np.testing.assert_array_equal(shifted, ref, err_msg=f"s={s}")
