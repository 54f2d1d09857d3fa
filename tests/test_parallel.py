"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

Run in clean subprocesses (see conftest) because the in-process backend may
already be a single TPU chip.
"""

import pytest

from tests.conftest import run_in_cpu_subprocess


@pytest.mark.slow
def test_dryrun_multichip_8():
    run_in_cpu_subprocess(
        """
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ge", "/root/repo/__graft_entry__.py")
        ge = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ge)
        ge.dryrun_multichip(8)
        """,
        timeout=1200,
    )


def test_mesh_shapes():
    run_in_cpu_subprocess(
        """
        import jax
        from nsof_tpu.parallel.mesh import make_mesh, data_sharding
        assert len(jax.devices()) == 8
        mesh = make_mesh(8, model_parallel=2)
        assert mesh.shape == {"data": 4, "model": 2}
        mesh = make_mesh(8)
        assert mesh.shape == {"data": 8, "model": 1}
        """
    )


@pytest.mark.slow
def test_sharded_seg_inference_matches_single_device():
    """shard_map'd seg_batch_fast over 8 devices == unsharded result."""
    run_in_cpu_subprocess(
        """
        import dataclasses, numpy as np, jax, jax.numpy as jnp
        from nsof_tpu.config import DATASETS
        from nsof_tpu.parallel.mesh import make_mesh
        from nsof_tpu.parallel.inference import make_sharded_seg_batch
        from nsof_tpu.pipelines.segmentation import seg_batch_fast
        jax.config.update("jax_default_matmul_precision", "highest")

        cfg = dataclasses.replace(
            DATASETS["tabletennis"], image_h=96, image_w=128,
            window_h=96, window_w=128,
        )
        cfg = dataclasses.replace(
            cfg, roi=dataclasses.replace(cfg.roi, memsize=16)
        )
        rng = np.random.default_rng(0)
        B = 8
        mem = rng.integers(0, 256, (B, 6, 8)).astype(np.uint8)
        prev = rng.integers(0, 256, (B, 96, 128)).astype(np.uint8)
        nxt = rng.integers(0, 256, (B, 96, 128)).astype(np.uint8)

        mesh = make_mesh(8)
        fn = make_sharded_seg_batch(mesh, cfg, kernel_mode="xla")
        with mesh:
            out = fn(jnp.asarray(mem), jnp.asarray(prev), jnp.asarray(nxt))
        ref = seg_batch_fast(
            jnp.asarray(mem), jnp.asarray(prev), jnp.asarray(nxt), cfg,
            3, "xla",
        )
        np.testing.assert_array_equal(
            np.asarray(out["mask"]), np.asarray(ref["mask"]))
        np.testing.assert_array_equal(
            np.asarray(out["box"]), np.asarray(ref["box"]))
        """,
        timeout=1200,
    )


def test_sharded_batch_farneback_matches_single_device():
    """Data-parallel farneback over the mesh == single-device result."""
    run_in_cpu_subprocess(
        """
        import jax, numpy as np, jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from nsof_tpu.parallel.mesh import make_mesh
        from nsof_tpu.ops.farneback import farneback_batch, FarnebackParams
        jax.config.update("jax_default_matmul_precision", "highest")

        p = FarnebackParams(0.5, 1, 9, 2, 5, 1.1)
        rng = np.random.default_rng(0)
        a = (rng.random((8, 48, 64)) * 255).astype(np.uint8)
        b = (rng.random((8, 48, 64)) * 255).astype(np.uint8)

        mesh = make_mesh(8)
        sh = NamedSharding(mesh, P("data"))
        aj = jax.device_put(jnp.asarray(a), sh)
        bj = jax.device_put(jnp.asarray(b), sh)
        out_sharded = np.asarray(farneback_batch(aj, bj, p))
        out_single = np.asarray(
            farneback_batch(jnp.asarray(a), jnp.asarray(b), p))
        d = np.abs(out_sharded - out_single)
        assert d.max() < 0.05, d.max()
        """
    )
