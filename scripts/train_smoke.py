"""Smoke-training run: sharded RAFT/FlowFormer steps on the synthetic
affine dataset, with a mid-run orbax save/restore (the reference's training
loop capability, codebase/RAFT/train.py:136-214, staged via
--restore_ckpt as in train_standard.sh).

Runs on a virtual 8-device CPU mesh (dp=4 × tp=2) unless the backend
already exposes ≥2 devices.  Self-re-execs like tests/conftest's
run_in_cpu_subprocess when needed.

Usage: python scripts/train_smoke.py [--model raft|flowformer]
       [--steps 240] [--out results/train_smoke.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _reexec_cpu(n: int = 8) -> None:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env["_SMOKE_INNER"] = "1"
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy, sys\n"
        f"sys.argv = {[str(a) for a in sys.argv]!r}\n"
        f"runpy.run_path({str(REPO / 'scripts/train_smoke.py')!r},"
        " run_name='__main__')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO)
    sys.exit(proc.returncode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="raft",
                    choices=["raft", "flowformer"])
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="results/train_smoke.json")
    ap.add_argument("--size", default="96x128",
                    help="HxW of the synthetic frames")
    args = ap.parse_args()

    import jax

    if len(jax.devices()) < 2 and "_SMOKE_INNER" not in os.environ:
        _reexec_cpu(8)

    import numpy as np
    import jax.numpy as jnp
    import tempfile

    from nsof_tpu.data.flow_datasets import (
        batch_iterator,
        synthetic_affine_dataset,
    )
    from nsof_tpu.parallel.mesh import make_mesh
    from nsof_tpu.parallel.train import create_train_state, make_train_step
    from nsof_tpu.train.trainer import (
        restore_checkpoint,
        save_checkpoint,
    )
    from nsof_tpu.models.raft import RaftConfig

    rng_np = np.random.default_rng(0)
    size = tuple(int(v) for v in args.size.split("x"))
    train_pairs = synthetic_affine_dataset(rng_np, n=64, size=size,
                                           max_shift=4.0)
    val_pairs = synthetic_affine_dataset(
        np.random.default_rng(1), n=8, size=size, max_shift=4.0
    )

    n_dev = len(jax.devices())
    mp = 2 if n_dev % 2 == 0 and n_dev >= 4 else 1
    mesh = make_mesh(n_dev, model_parallel=mp)
    rng = jax.random.PRNGKey(0)

    if args.model == "raft":
        cfg = RaftConfig(small=True, iters=4)
        model, tx, state = create_train_state(
            rng, mesh, cfg, image_hw=size, num_steps=args.steps,
            lr=2e-4, tp_min_features=64,
        )
        step_fn = make_train_step(model, tx, mesh, iters=4)

        def apply_flow(params, i1, i2):
            _, up = model.apply(
                {"params": params}, i1[None], i2[None], iters=8,
                test_mode=True,
            )
            return up[0]
    else:
        from nsof_tpu.parallel.train import (
            create_flowformer_state,
            make_flowformer_step,
        )

        from nsof_tpu.models.flowformer import FlowFormerConfig

        # shallow decoder for the smoke run (the full 32-step decoder's
        # unrolled training graph takes tens of minutes to compile on CPU)
        ff_cfg = FlowFormerConfig(decoder_depth=6)
        model, tx, state = create_flowformer_state(
            rng, mesh, cfg=ff_cfg, image_hw=size, num_steps=args.steps,
            lr=2e-4,
        )
        step_fn = make_flowformer_step(model, tx, mesh)

        def apply_flow(params, i1, i2):
            return model.apply({"params": params}, i1[None], i2[None])[-1][0]

    def epe(params) -> float:
        es = []
        for i1, i2, gt in val_pairs:
            pred = np.asarray(apply_flow(params, jnp.asarray(i1),
                                         jnp.asarray(i2)))
            es.append(float(np.sqrt(((pred - gt) ** 2).sum(-1)).mean()))
        return float(np.mean(es))

    log: list[dict] = []
    epe0 = epe(state.params)
    log.append({"step": 0, "epe": epe0})
    print(f"step 0: val EPE {epe0:.3f}", flush=True)

    ckpt_dir = tempfile.mkdtemp(prefix="smoke_ckpt_")
    half = args.steps // 2
    it = batch_iterator(train_pairs, args.batch, rng_np)

    def run(state, start, stop):
        losses = []
        for step in range(start, stop):
            batch = next(it)
            state, metrics = step_fn(state, batch)
            losses.append(float(metrics["loss"]))
            if (step + 1) % 40 == 0:
                e = epe(jax.device_get(state.params))
                log.append(
                    {
                        "step": step + 1,
                        "loss_mean40": float(np.mean(losses[-40:])),
                        "epe": e,
                    }
                )
                print(f"step {step+1}: loss {np.mean(losses[-40:]):.4f} "
                      f"val EPE {e:.3f}", flush=True)
        return state

    state = run(state, 0, half)
    save_checkpoint(ckpt_dir, half, jax.device_get(state))
    # resume exercise: restore into a FRESH state pytree (orbax restore
    # onto the abstract structure), then continue training
    _, _, fresh = (
        create_train_state(
            jax.random.PRNGKey(1), mesh,
            RaftConfig(small=True, iters=4), image_hw=size,
            num_steps=args.steps, lr=2e-4, tp_min_features=64,
        )
        if args.model == "raft"
        else (model, tx, state)
    )
    if args.model == "raft":
        shardings = jax.tree.map(lambda x: x.sharding, state)
        restored, start_step = restore_checkpoint(
            ckpt_dir, jax.device_get(fresh)
        )
        assert start_step == half, (start_step, half)
        l0 = jax.tree.leaves(jax.device_get(state.params))[0]
        l1 = jax.tree.leaves(jax.device_get(restored.params))[0]
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1))
        # re-place the host-restored pytree onto the mesh shardings
        state = jax.device_put(restored, shardings)
        print(f"resumed from step {start_step} (params bit-equal)",
              flush=True)
    state = run(state, half, args.steps)

    out = {
        "model": args.model,
        "steps": args.steps,
        "devices": n_dev,
        "mesh": {"data": n_dev // mp, "model": mp},
        "resume_at": half,
        "log": log,
        "epe_initial": log[0]["epe"],
        "epe_final": log[-1]["epe"],
    }
    out_path = REPO / args.out
    out_path.parent.mkdir(parents=True, exist_ok=True)
    existing = []
    if out_path.exists():
        existing = json.loads(out_path.read_text())
    existing = [e for e in existing if e.get("model") != args.model]
    existing.append(out)
    out_path.write_text(json.dumps(existing, indent=1))
    print(json.dumps({k: out[k] for k in
                      ("model", "epe_initial", "epe_final", "mesh")}))


if __name__ == "__main__":
    main()
