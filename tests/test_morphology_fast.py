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
