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
