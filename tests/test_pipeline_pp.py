"""Pipeline (pp) parallelism tests on a virtual 8-device CPU mesh.

The generic GPipe combinator must equal the sequential composition of
its stages; the RAFT iterations-as-stages pipeline must reproduce the
unsharded test-mode forward.
"""

import pytest

from tests.conftest import run_in_cpu_subprocess


def test_pipeline_stages_match_sequential():
    """4 distinct linear stages x 6 microbatches == sequential apply."""
    run_in_cpu_subprocess(
        """
        import numpy as np, jax, jax.numpy as jnp
        from jax.sharding import Mesh
        from nsof_tpu.parallel.pipeline import pipeline_stages

        S, M, D = 4, 6, 8
        mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
        rng = np.random.default_rng(0)
        Ws = jnp.asarray(rng.normal(size=(S, D, D)), jnp.float32)
        bs = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
        xs = jnp.asarray(rng.normal(size=(M, 3, D)), jnp.float32)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, (M, 1, 1)), jnp.float32)

        def stage_fn(params, const, act):
            W, b = params
            return jnp.tanh(act @ W + b) * const

        out = pipeline_stages(
            mesh, stage_fn, (Ws, bs), xs, scale
        )

        ref = xs
        for s in range(S):
            ref = jnp.tanh(ref @ Ws[s] + bs[s]) * scale
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=1e-6
        )
        print("pipeline combinator ok")
        """
    )


def test_pipeline_single_stage_degenerates_to_map():
    run_in_cpu_subprocess(
        """
        import numpy as np, jax, jax.numpy as jnp
        from jax.sharding import Mesh
        from nsof_tpu.parallel.pipeline import (
            pipeline_stages, tied_stage_params
        )

        mesh = Mesh(np.array(jax.devices()[:1]), ("stage",))
        xs = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
        params = tied_stage_params({"w": jnp.float32(2.0)}, 1)
        out = pipeline_stages(
            mesh, lambda p, c, a: a * p["w"], params, xs
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(xs) * 2.0)
        """,
        n_devices=1,
    )


@pytest.mark.slow
def test_raft_pp_matches_unsharded_forward():
    """8-stage pipelined small RAFT == unsharded apply (test_mode)."""
    run_in_cpu_subprocess(
        """
        import numpy as np, jax, jax.numpy as jnp
        from jax.sharding import Mesh
        from nsof_tpu.models.raft import RAFT, RaftConfig
        from nsof_tpu.parallel.pipeline import make_raft_pp_flow
        jax.config.update("jax_default_matmul_precision", "highest")

        S, M, B, H, W = 8, 3, 1, 48, 64
        cfg = RaftConfig(small=True, iters=8)
        mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))

        rng = np.random.default_rng(0)
        img1 = jnp.asarray(
            rng.integers(0, 256, (M, B, H, W, 3)), jnp.float32)
        img2 = jnp.asarray(
            rng.integers(0, 256, (M, B, H, W, 3)), jnp.float32)

        model = RAFT(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), img1[0], img2[0], test_mode=True)

        pp_fn = make_raft_pp_flow(mesh, cfg)
        out = np.asarray(pp_fn(variables, img1, img2))

        for m in range(M):
            _, ref = model.apply(
                variables, img1[m], img2[m], test_mode=True)
            np.testing.assert_allclose(
                out[m], np.asarray(ref), rtol=0, atol=2e-4,
                err_msg=f"microbatch {m}")
        print("raft pp ok:", out.shape)
        """,
        timeout=1200,
    )


def test_raft_pp_validates_divisibility():
    run_in_cpu_subprocess(
        """
        import numpy as np, jax
        from jax.sharding import Mesh
        from nsof_tpu.models.raft import RaftConfig
        from nsof_tpu.parallel.pipeline import make_raft_pp_flow

        mesh = Mesh(np.array(jax.devices()[:3]), ("stage",))
        try:
            make_raft_pp_flow(mesh, RaftConfig(small=True, iters=8))
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "divide" in str(e)
        try:
            make_raft_pp_flow(
                mesh,
                RaftConfig(small=True, iters=9, corr_mode="alternate"),
            )
            raise AssertionError("expected NotImplementedError")
        except NotImplementedError:
            pass
        """
    )
