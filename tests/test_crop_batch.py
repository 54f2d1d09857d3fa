"""Batched DMA window crop: correctness + alignment contract."""

import jax
import jax.numpy as jnp
import numpy as np

from nsof_tpu.ops import roi as R


def test_crop_windows_batch_matches_vmap(rng):
    frames = jnp.asarray(
        rng.integers(0, 256, (8, 480, 640)), jnp.uint8
    )
    oys = jnp.asarray(rng.integers(0, 480 - 256, 8), jnp.int32)
    oxs = jnp.asarray(rng.integers(0, 640 - 384, 8), jnp.int32)
    got, oya, oxa = R.crop_windows_batch(frames, oys, oxs, 256, 384)
    # adjusted origins stay within frame and at/below the requested ones
    assert (np.asarray(oya) <= np.asarray(oys)).all()
    assert (np.asarray(oxa) <= np.asarray(oxs)).all()
    ref = jax.vmap(
        lambda f, oy, ox: R.crop_window(f, (oy, ox), 256, 384)
    )(frames, oya, oxa)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_onehot_crop_batch_exact(rng):
    # u8 3-channel and f32 2-channel, exact vs vmapped dynamic_slice
    for arr, dt in (
        (rng.integers(0, 256, (5, 60, 80, 3)), jnp.uint8),
        (rng.standard_normal((5, 60, 80, 2)) * 37.5, jnp.float32),
    ):
        frames = jnp.asarray(arr, dt)
        oys = jnp.asarray(rng.integers(0, 60 - 24, 5), jnp.int32)
        oxs = jnp.asarray(rng.integers(0, 80 - 32, 5), jnp.int32)
        got = R.onehot_crop_batch(frames, oys, oxs, 24, 32)
        ref = jax.vmap(
            lambda f, oy, ox: R.crop_window(f, (oy, ox), 24, 32)
        )(frames, oys, oxs)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # 2D (no channel) path
    frames = jnp.asarray(rng.integers(0, 256, (3, 40, 50)), jnp.uint8)
    oys = jnp.asarray([0, 5, 16], jnp.int32)
    oxs = jnp.asarray([18, 0, 7], jnp.int32)
    got = R.onehot_crop_batch(frames, oys, oxs, 24, 32)
    ref = jax.vmap(
        lambda f, oy, ox: R.crop_window(f, (oy, ox), 24, 32)
    )(frames, oys, oxs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_onehot_scatter_batch_exact(rng):
    # pre-masked windows into zeros == vmapped scatter_window into zeros
    wins = jnp.asarray(rng.standard_normal((4, 24, 32, 2)), jnp.float32)
    oys = jnp.asarray(rng.integers(0, 60 - 24, 4), jnp.int32)
    oxs = jnp.asarray(rng.integers(0, 80 - 32, 4), jnp.int32)
    # box == the full window → scatter_window writes everything
    boxes = jnp.stack(
        [oxs, oys, oxs + 32, oys + 24], axis=1
    ).astype(jnp.int32)
    got = R.onehot_scatter_batch(wins, oys, oxs, 60, 80)
    ref = jax.vmap(
        lambda wn, b, oy, ox: R.scatter_window(
            jnp.zeros((60, 80, 2), jnp.float32), wn, b, (oy, ox)
        )
    )(wins, boxes, oys, oxs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # u8 2D masks
    m = jnp.asarray(rng.integers(0, 2, (4, 24, 32)) * 255, jnp.uint8)
    got = R.onehot_scatter_batch(m, oys, oxs, 60, 80)
    ref = jax.vmap(
        lambda wn, b, oy, ox: R.scatter_window(
            jnp.zeros((60, 80), jnp.uint8), wn, b, (oy, ox)
        )
    )(m, boxes, oys, oxs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_crop_windows_batch_fallback_nonaligned(rng):
    # odd window sizes take the vmap fallback and keep origins unchanged
    frames = jnp.asarray(rng.integers(0, 256, (4, 100, 150)), jnp.uint8)
    oys = jnp.asarray([3, 7, 11, 13], jnp.int32)
    oxs = jnp.asarray([5, 9, 17, 21], jnp.int32)
    got, oya, oxa = R.crop_windows_batch(frames, oys, oxs, 33, 41)
    np.testing.assert_array_equal(np.asarray(oya), np.asarray(oys))
    ref = jax.vmap(
        lambda f, oy, ox: R.crop_window(f, (oy, ox), 33, 41)
    )(frames, oys, oxs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
