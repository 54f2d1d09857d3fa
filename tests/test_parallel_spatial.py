"""Spatial (sp) parallel flow on a virtual 8-device CPU mesh: halo
exchange correctness and sharded-vs-unsharded flow agreement."""

import pytest

from tests.conftest import run_in_cpu_subprocess


def test_halo_exchange_rows():
    """Interior shards see true neighbour rows; boundary shards see the
    BORDER_REFLECT_101 reflection of their own edge."""
    run_in_cpu_subprocess(
        """
        import numpy as np, jax, jax.numpy as jnp
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        from nsof_tpu.parallel.spatial import halo_exchange_rows

        n, hs, w, r = 8, 4, 3, 2
        x = np.arange(n * hs * w, dtype=np.float32).reshape(n * hs, w)
        mesh = Mesh(np.array(jax.devices()), ("space",))
        fn = shard_map(
            lambda a: halo_exchange_rows(a, r, "space", n),
            mesh=mesh, in_specs=P("space", None),
            out_specs=P("space", None), check_rep=False,
        )
        out = np.asarray(jax.jit(fn)(x)).reshape(n, hs + 2 * r, w)
        for i in range(n):
            lo, hi = i * hs, (i + 1) * hs
            np.testing.assert_array_equal(out[i, r:-r], x[lo:hi])
            if i > 0:
                np.testing.assert_array_equal(out[i, :r], x[lo - r:lo])
            else:
                np.testing.assert_array_equal(out[i, :r], x[r:0:-1])
            if i < n - 1:
                np.testing.assert_array_equal(out[i, -r:], x[hi:hi + r])
            else:
                np.testing.assert_array_equal(
                    out[i, -r:], x[hi - 2:hi - 2 - r:-1]
                )
        """
    )


@pytest.mark.slow
def test_spatial_flow_matches_unsharded():
    """8-way row-sharded Farnebäck == single-device flow away from the
    true image border (interior-exact overlap-tile contract)."""
    run_in_cpu_subprocess(
        """
        import numpy as np, jax, jax.numpy as jnp
        from jax.sharding import Mesh
        from nsof_tpu.ops.farneback import FarnebackParams, farneback
        from nsof_tpu.parallel.spatial import (
            make_spatial_flow, suggested_halo)
        jax.config.update("jax_default_matmul_precision", "highest")

        params = FarnebackParams(0.5, 2, 5, 2, 5, 1.1)
        halo = suggested_halo(params, max_disp=4.0)
        assert halo % 4 == 0
        h, w = 512, 96
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (h + 8, w + 8)).astype(np.float32)
        import scipy.ndimage as ndi
        base = ndi.gaussian_filter(base, 3.0)
        prev = base[4:4 + h, 4:4 + w]
        nxt = base[6:6 + h, 3:3 + w]   # global (dx, dy) = (-1, 2)

        want = np.asarray(farneback(prev, nxt, params))
        mesh = Mesh(np.array(jax.devices()), ("space",))
        got = np.asarray(
            make_spatial_flow(mesh, params, halo)(prev, nxt))
        assert got.shape == want.shape
        # away from the true image border both paths see identical data
        interior = (slice(halo, h - halo), slice(None))
        epe = np.hypot(*(got[interior] - want[interior]).transpose(2, 0, 1))
        # interior-exact: measured ~1e-6 (pyramid grids align because
        # halo and slab rows are multiples of 2**levels)
        assert np.median(epe) < 1e-3, np.median(epe)
        assert np.mean(epe) < 1e-2, np.mean(epe)
        """,
        timeout=900,
    )


@pytest.mark.slow
def test_spatial_batch_2d_mesh():
    """sp x dp 2-D decomposition runs and matches per-pair sp flow."""
    run_in_cpu_subprocess(
        """
        import numpy as np, jax
        from jax.sharding import Mesh
        from nsof_tpu.ops.farneback import FarnebackParams
        from nsof_tpu.parallel.spatial import (
            make_spatial_flow, make_spatial_flow_batch)
        jax.config.update("jax_default_matmul_precision", "highest")

        params = FarnebackParams(0.5, 1, 5, 1, 5, 1.1)
        halo = 16
        mesh2 = Mesh(
            np.array(jax.devices()).reshape(2, 4), ("data", "space"))
        mesh1 = Mesh(np.array(jax.devices())[:4], ("space",))
        rng = np.random.default_rng(1)
        prev = rng.uniform(0, 255, (2, 128, 64)).astype(np.float32)
        nxt = rng.uniform(0, 255, (2, 128, 64)).astype(np.float32)
        got = np.asarray(
            make_spatial_flow_batch(mesh2, params, halo)(prev, nxt))
        one = make_spatial_flow(mesh1, params, halo)
        for b in range(2):
            want = np.asarray(one(prev[b], nxt[b]))
            assert np.max(np.abs(got[b] - want)) < 1e-4
        """,
        timeout=900,
    )
