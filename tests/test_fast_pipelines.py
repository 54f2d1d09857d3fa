"""Fast batched tracking/prediction must match their per-sample steps."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REFERENCE_DATA, requires_reference_data

pytestmark = requires_reference_data


@pytest.fixture(scope="module")
def tt_scene():
    from nsof_tpu.data import load_scene

    return load_scene(REFERENCE_DATA, "tabletennis", max_frames=8)


@pytest.mark.slow
def test_tracking_batch_fast_produces_boxes(tt_scene):
    from nsof_tpu.pipelines.tracking import tracking_batch_fast

    scene = tt_scene
    n = scene.num_pairs
    out = tracking_batch_fast(
        jnp.asarray(scene.mem_gray[1 : n + 1]),
        jnp.asarray(scene.frames_gray[:n]),
        jnp.asarray(scene.frames_gray[1 : n + 1]),
        scene.cfg,
    )
    assert out["boxes"].shape[-1] == 4
    assert np.asarray(out["valid"]).any()
    # boxes stay inside the image
    b = np.asarray(out["boxes"])[np.asarray(out["valid"])]
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= scene.cfg.image_w).all()


@pytest.mark.slow
def test_prediction_batch_fast_matches_step(tt_scene):
    from nsof_tpu.pipelines.prediction import (
        prediction_batch_fast,
        prediction_step,
        prediction_ssim,
    )

    scene = tt_scene
    n = scene.num_pairs
    out = prediction_batch_fast(
        jnp.asarray(scene.mem_gray[1 : n + 1]),
        jnp.asarray(scene.frames_gray[:n]),
        jnp.asarray(scene.frames_gray[1 : n + 1]),
        jnp.asarray(scene.frames_bgr[1 : n + 1]),
        scene.cfg,
    )
    preds = np.asarray(out["pred"])
    assert preds.shape[0] == n
    # SSIM vs true future stays close to the exact per-pair step
    i = 3
    mem2, prev, nxt = scene.pair_inputs(i)
    exact = prediction_step(mem2, prev, nxt, scene.frames_bgr[i + 1],
                            scene.cfg)
    s_fast = float(prediction_ssim(preds[i], scene.frames_bgr[i + 2]))
    s_exact = float(
        prediction_ssim(np.asarray(exact["pred"]), scene.frames_bgr[i + 2])
    )
    assert abs(s_fast - s_exact) < 0.05
    assert s_fast > 0.5
