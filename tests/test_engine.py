"""BatchingEngine (nsof_tpu/serve/engine.py): dynamic request batching
over the seg_batch_fast throughput path.

Runs on the CPU backend in a subprocess (threading + device dispatch,
no tunnel contention); asserts result parity with direct calls,
coalescing behaviour, error isolation, and clean shutdown.
"""

import pytest

from conftest import run_in_cpu_subprocess


@pytest.mark.slow  # compiles all 4 batch buckets + the parity reference
def test_engine_parity_coalescing_errors_shutdown():
    run_in_cpu_subprocess(
        """
        import dataclasses, threading
        import numpy as np
        import jax

        from nsof_tpu.config import DATASETS
        from nsof_tpu.pipelines.segmentation import seg_batch_fast
        from nsof_tpu.serve import BatchingEngine
        jax.config.update("jax_default_matmul_precision", "highest")

        cfg = dataclasses.replace(
            DATASETS["tabletennis"], image_h=96, image_w=128,
            window_h=96, window_w=128,
        )
        cfg = dataclasses.replace(
            cfg, roi=dataclasses.replace(cfg.roi, memsize=16)
        )
        gh, gw = 96 // 16, 128 // 16

        rng = np.random.default_rng(0)
        N = 12
        mems = rng.integers(0, 256, (N, gh, gw)).astype(np.uint8)
        prevs = rng.integers(0, 256, (N, 96, 128)).astype(np.uint8)
        nxts = rng.integers(0, 256, (N, 96, 128)).astype(np.uint8)

        eng = BatchingEngine(cfg, max_batch=8, max_wait_ms=50)
        assert eng.buckets == (1, 2, 4, 8)
        eng.warmup()

        # submit all N from worker threads (concurrent callers)
        futs = [None] * N
        def worker(i):
            futs[i] = eng.submit(mems[i], prevs[i], nxts[i])
        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(N)
        ]
        for t in threads: t.start()
        for t in threads: t.join()
        results = [f.result(timeout=300) for f in futs]

        # parity vs one direct batched call
        ref = seg_batch_fast(mems, prevs, nxts, cfg)
        ref = {k: np.asarray(v) for k, v in ref.items()}
        for i, r in enumerate(results):
            assert set(r) == set(ref)
            for k in ref:
                np.testing.assert_array_equal(
                    r[k], ref[k][i], err_msg=f"req {i} key {k}"
                )

        # coalescing: far fewer dispatches than requests
        s = eng.stats.as_dict()
        assert s["requests"] == N
        assert s["dispatches"] < N, s
        assert s["mean_batch"] > 1.5, s

        # error isolation: a malformed request fails its future only
        bad = eng.submit(
            np.zeros((gh, gw), np.uint8),
            np.zeros((96,), np.uint8),           # rank-1 image: must raise
            np.zeros((96, 128), np.uint8),
        )
        err = None
        try:
            bad.result(timeout=300)
        except Exception as e:
            err = e
        assert err is not None

        # engine still serves after the failure
        ok = eng.submit(mems[0], prevs[0], nxts[0]).result(timeout=300)
        np.testing.assert_array_equal(ok["mask"], ref["mask"][0])

        eng.shutdown()
        try:
            eng.submit(mems[0], prevs[0], nxts[0])
            raise AssertionError("expected RuntimeError after shutdown")
        except RuntimeError:
            pass
        print("engine ok:", s)
        """,
        n_devices=1,
        timeout=1800,
    )


@pytest.mark.slow  # compiles deep buckets on CPU
def test_deep_engine_parity_and_shutdown():
    """BatchingEngine.for_deep_backend serves the batched deep step with
    per-request results equal to the direct deep_roi_flow_batch call."""
    run_in_cpu_subprocess(
        """
        import dataclasses, threading
        import numpy as np
        import jax
        import jax.numpy as jnp

        from nsof_tpu.config import DATASETS
        from nsof_tpu.models.raft import RAFT, RaftConfig
        from nsof_tpu.ops.roi import RoiConfig
        from nsof_tpu.pipelines.deep_flow import (
            DeepBackend, deep_roi_flow_batch,
        )
        from nsof_tpu.serve import BatchingEngine

        H, W = 96, 128
        cfg = dataclasses.replace(
            DATASETS["grasp"], name="deepserve", image_h=H, image_w=W,
            window_h=72, window_w=96,
            roi=RoiConfig(memsize=24, thres=100, mode=2, k_max=8),
        )
        model = RAFT(RaftConfig(small=True, iters=2))
        dummy = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        params = model.init(
            jax.random.PRNGKey(0), dummy, dummy, iters=1)["params"]
        backend = DeepBackend.from_raft(model, params, iters=2)

        eng = BatchingEngine.for_deep_backend(
            cfg, backend, max_batch=4, max_wait_ms=50)
        assert eng.buckets == (1, 2, 4)
        eng.warmup()

        gh, gw = H // 8, W // 8
        rng = np.random.default_rng(1)
        N = 5
        mems = np.zeros((N, gh, gw), np.uint8)
        mems[:, 2:11, 3:14] = 255
        prevs = rng.integers(0, 255, (N, H, W, 3)).astype(np.uint8)
        nxts = rng.integers(0, 255, (N, H, W, 3)).astype(np.uint8)

        futs = [None] * N
        def worker(i):
            futs[i] = eng.submit(mems[i], prevs[i], nxts[i])
        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(N)
        ]
        for t in threads: t.start()
        for t in threads: t.join()
        results = [f.result(timeout=300) for f in futs]

        ref = deep_roi_flow_batch(
            jnp.asarray(mems), jnp.asarray(prevs), jnp.asarray(nxts),
            cfg, backend)
        ref = {k: np.asarray(v) for k, v in ref.items()}
        for i, r in enumerate(results):
            # gate math is integer/batch-invariant -> exact; the model's
            # conv reductions may reassociate across batch sizes -> allow
            # boundary flicker on the thresholded mask
            agree = (r["mask"] == ref["mask"][i]).mean()
            assert agree >= 0.999, (i, agree)
            np.testing.assert_array_equal(r["box"], ref["box"][i])
            assert bool(r["any_active"]) == bool(ref["any_active"][i])
        eng.shutdown()
        print("deep engine OK")
        """
    )
