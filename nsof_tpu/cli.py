"""Unified command-line interface.

Replaces the reference's scattered script CLIs with subcommands:

- ``seg`` / ``track`` / ``predict`` — run a task pipeline on a bundled
  scene (the reference's optical_flow_{seg,ob,prediction}.py mains).
- ``eventsim`` — event-driven device simulation from HDF5 or the synthetic
  moving-box stream (eventsim/event_mem_sim.py CLI, :334-373).
- ``framesim`` — frame-driven simulation from a folder of grayscale frames
  (the MATLAB pipeline driver).
- ``visualize`` — render npz results (visualize_npz_keyframes.py CLI).

Run ``python -m nsof_tpu.cli <command> --help`` for options.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys


def _add_scene_args(p):
    p.add_argument("--data-root", default="/root/reference/data")
    p.add_argument("--scene", default="tabletennis",
                   help="grasp|tabletennis|autodriving|uav|uavnew2")
    p.add_argument("--out", default=None, help="output directory")
    p.add_argument("--max-frames", type=int, default=None)


def cmd_task(kind: str, args) -> int:
    import numpy as np

    from nsof_tpu.data import load_scene
    from nsof_tpu.pipelines import runner

    scene = load_scene(args.data_root, args.scene, args.max_frames)
    out_dir = pathlib.Path(args.out or f"output/{args.scene}_{kind}")
    out_dir.mkdir(parents=True, exist_ok=True)
    if kind == "seg":
        res = runner.run_segmentation(
            scene, csv_path=out_dir / "metrics_seg.csv"
        )
        import cv2

        for i in range(res.masks.shape[0]):
            cv2.imwrite(str(out_dir / f"seg_{scene.names[i+1]}"),
                        res.masks[i])
            cv2.imwrite(str(out_dir / f"origseg_{scene.names[i+1]}"),
                        res.masks_full[i])
    elif kind == "track":
        res = runner.run_tracking(scene)
        rows = []
        for i in range(res.boxes.shape[0]):
            keep = res.boxes[i][res.boxes_valid[i]]
            rows.append({"frame": scene.names[i + 1],
                         "boxes": keep.tolist()})
        (out_dir / "tracks.json").write_text(json.dumps(rows, indent=2))
    else:
        res = runner.run_prediction(scene)
        import cv2

        for i in range(res.preds.shape[0]):
            cv2.imwrite(str(out_dir / f"pred_{scene.names[i+1]}"),
                        res.preds[i])
    print(json.dumps({"metrics": res.metrics, "timing": res.timing}))
    return 0


def cmd_train(args) -> int:
    """Staged RAFT training (train_standard.sh:3-6 / fetch_dataloader
    stage mixes) on a data×model device mesh."""
    from nsof_tpu.models.raft import RaftConfig
    from nsof_tpu.parallel.mesh import make_mesh
    from nsof_tpu.train.curriculum import (
        RAFT_STANDARD_STAGES,
        run_curriculum,
    )

    if args.mesh:
        dp, tp = (int(x) for x in args.mesh.split("x"))
        mesh = make_mesh(dp * tp, model_parallel=tp)
    else:
        mesh = make_mesh()
    stages = RAFT_STANDARD_STAGES
    if args.stage:
        by_name = {s.name: s for s in RAFT_STANDARD_STAGES}
        if args.stage not in by_name:
            print(f"unknown stage {args.stage!r}; have {sorted(by_name)}")
            return 2
        import dataclasses as _dc

        stages = (_dc.replace(by_name[args.stage], restore_from=None),)
    results = run_curriculum(
        mesh,
        args.data_root,
        args.ckpt_root,
        stages=stages,
        raft_cfg=RaftConfig(small=args.small),
        steps_per_stage=args.steps,
        val_freq=args.val_freq,
    )
    print(json.dumps({"stages": sorted(results)}))
    return 0


def cmd_deep(args) -> int:
    """Deep-backend neuromorphic pipelines (raft_{seg,ob,prediction}.py
    / ff_* equivalents): 1/3-resized frames, MEMSIZE/3 gating, RAFT or
    FlowFormer flow, task head.  Without --ckpt the model runs with
    freshly initialised weights (the reference likewise requires a
    separately downloaded .pth)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nsof_tpu.data import load_scene
    from nsof_tpu.pipelines import deep_flow as dfl

    scene = load_scene(args.data_root, args.scene, args.max_frames)
    cfg0 = scene.cfg
    h3, w3 = cfg0.image_h // 3, cfg0.image_w // 3
    cfg = dataclasses.replace(
        cfg0, image_h=h3, image_w=w3, window_h=h3, window_w=w3
    )

    if args.backend == "raft":
        from nsof_tpu.models.raft import RAFT, RaftConfig

        if getattr(args, "torch_ckpt", None):
            # reference .pth (raft-things/raft-small, download_models.sh)
            from nsof_tpu.models.convert import pretrained_raft

            model, variables = pretrained_raft(args.torch_ckpt)
            model = RAFT(dataclasses.replace(model.cfg, iters=args.iters))
            params = variables["params"]
        else:
            model = RAFT(RaftConfig(small=args.small, iters=args.iters))
            dummy = jnp.zeros((1, 64, 64, 3), jnp.uint8)
            params = model.init(
                jax.random.PRNGKey(0), dummy, dummy, iters=1
            )["params"]
        if args.ckpt and not getattr(args, "torch_ckpt", None):
            # checkpoints are TrainState trees (see train_smoke.py);
            # restore against an abstract template and keep the params
            from nsof_tpu.parallel.train import TrainState
            from nsof_tpu.train.optim import raft_optimizer
            from nsof_tpu.train.trainer import restore_checkpoint

            tx = raft_optimizer(lr=1e-4, num_steps=100)
            template = TrainState(
                params, jax.eval_shape(tx.init, params),
                jnp.zeros((), jnp.int32),
            )
            state, _ = restore_checkpoint(args.ckpt, template)
            params = state.params
        backend = dfl.DeepBackend.from_raft(model, params, iters=args.iters)
    else:
        from nsof_tpu.models.flowformer import FlowFormer, FlowFormerConfig

        if getattr(args, "torch_ckpt", None):
            # reference FF release .pth (things.pth etc., ff_seg.py:640-658)
            from nsof_tpu.models.flowformer.convert import (
                pretrained_flowformer,
            )

            model, variables = pretrained_flowformer(args.torch_ckpt)
            params = variables["params"]
        else:
            model = FlowFormer(FlowFormerConfig())
            dummy = jnp.zeros((1, 64, 64, 3), jnp.uint8)
            params = model.init(
                jax.random.PRNGKey(0), dummy, dummy
            )["params"]
        backend = dfl.DeepBackend.from_flowformer(model, params)

    step = {
        "seg": lambda m, p, n, f: dfl.deep_roi_flow_step(
            m, p, n, cfg, backend
        ),
        "track": lambda m, p, n, f: dfl.deep_roi_tracking_step(
            m, p, n, cfg, backend
        ),
        "predict": lambda m, p, n, f: dfl.deep_roi_prediction_step(
            m, p, n, f, cfg, backend
        ),
    }[args.task]
    jstep = jax.jit(step)

    out_dir = pathlib.Path(
        args.out or f"output/{args.scene}_deep_{args.task}"
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    frames3 = np.asarray(
        dfl.resize_third(jnp.asarray(scene.frames_bgr))
    ).astype(np.uint8)
    for i in range(scene.num_pairs):
        mem2, _, _ = scene.pair_inputs(i)
        out = jstep(
            mem2, jnp.asarray(frames3[i]), jnp.asarray(frames3[i + 1]),
            jnp.asarray(frames3[i + 1]),
        )
        rec = {
            "frame": scene.names[i + 1],
            "active": bool(out["any_active"]),
            "region_pct": float(out["region_pct"]),
        }
        if args.task == "track":
            rec["boxes"] = np.asarray(
                out["boxes"][np.asarray(out["valid"])]
            ).tolist()
        rows.append(rec)
    (out_dir / f"deep_{args.task}.json").write_text(
        json.dumps(rows, indent=1)
    )
    print(json.dumps({"pairs": len(rows), "out": str(out_dir)}))
    return 0


def cmd_eventsim(args) -> int:
    import numpy as np

    from nsof_tpu.device import (
        EventSimConfig,
        bin_events,
        generate_synthetic_events,
        io,
        simulate_events,
    )

    h5_path = pathlib.Path(args.h5)
    if args.synthetic:
        x, y, p, t = generate_synthetic_events()
        h5_path = pathlib.Path("synthetic.hdf5")
        io.save_events_h5(h5_path, x, y, p, t)
        print(f"synthetic stream saved to {h5_path}")
    else:
        x, y, p, t, _, _ = io.load_events_h5(h5_path)

    binned = bin_events(x, y, p, t, slice_us=args.slice_us)
    cfg = EventSimConfig(
        version=args.version,
        active_v=args.active_v,
        silent_v=args.silent_v,
        polarity=args.polarity,
    )
    out = simulate_events(binned, cfg)
    npz = h5_path.with_suffix(f".V{args.version}.npz")
    io.save_sim_npz(npz, out["w_final"], out["resistances"])
    io.save_sim_metadata(
        h5_path.with_suffix(f".V{args.version}.json.gz"),
        cfg, args.slice_us, h5_path,
    )
    if args.version == 2:
        io.save_sim_npz(
            h5_path.with_suffix(".V2_b.npz"),
            out["w_final_b"], out["resistances_b"],
        )
    if not args.no_video:
        from nsof_tpu.utils.visualize import write_video
        import numpy as np

        res = np.asarray(out["resistances"])
        write_video(list(res), h5_path.with_suffix(f".V{args.version}.mp4"),
                    fps=min(1_000_000 / args.slice_us, 60.0))
    print(f"results -> {npz}")
    return 0


def cmd_framesim(args) -> int:
    import cv2
    import numpy as np

    from nsof_tpu.device import FrameSimConfig, compress_frames, simulate_frames

    folder = pathlib.Path(args.frames)
    files = sorted(folder.glob("*.jpg"), key=lambda f: int(f.stem)) or sorted(
        folder.glob("*.png"), key=lambda f: int(f.stem)
    )
    files = files[args.start : args.end : args.interval]
    frames = (
        np.stack(
            [cv2.imread(str(f), cv2.IMREAD_GRAYSCALE) for f in files]
        ).astype(np.float32)
        / 255.0
    )
    region = None
    if args.region:
        y0, x0, y1, x1 = map(int, args.region.split(","))
        region = ((y0, x0), (y1, x1))
    grid = compress_frames(
        frames, args.m, args.n,
        region_ul=region[0] if region else None,
        region_lr=region[1] if region else None,
    )
    cfg = FrameSimConfig(m=args.m, n=args.n, th1=args.th1, th2=args.th2,
                         n_substeps=args.substeps)
    out = simulate_frames(grid, cfg)
    np_out = pathlib.Path(args.out or folder.parent / "framesim_result.npz")
    np.savez_compressed(
        np_out,
        w_final=np.asarray(out["w_final"]),
        resistances=np.asarray(out["resistances"]),
    )
    print(f"results -> {np_out}")
    return 0


def cmd_flow(args) -> int:
    """Folder flow inference + Middlebury color images (the RAFT demo.py
    equivalent, with the Farnebäck backend by default)."""
    import cv2
    import jax.numpy as jnp
    import numpy as np

    from nsof_tpu.ops.farneback import PRESETS, FarnebackParams, farneback
    from nsof_tpu.utils.flow_viz import flow_to_image

    folder = pathlib.Path(args.frames)
    files = sorted(
        [*folder.glob("*.jpg"), *folder.glob("*.png")],
        key=lambda f: int(f.stem) if f.stem.isdigit() else f.stem,
    )
    out_dir = pathlib.Path(args.out or folder.parent / "flow_viz")
    out_dir.mkdir(parents=True, exist_ok=True)
    params = PRESETS.get(args.preset, FarnebackParams())
    n = 0
    for f1, f2 in zip(files[:-1], files[1:]):
        g1 = cv2.imread(str(f1), cv2.IMREAD_GRAYSCALE)
        g2 = cv2.imread(str(f2), cv2.IMREAD_GRAYSCALE)
        flow = np.asarray(farneback(jnp.asarray(g1), jnp.asarray(g2), params))
        img = np.asarray(flow_to_image(jnp.asarray(flow), convert_to_bgr=True))
        cv2.imwrite(str(out_dir / f"flow_{f1.stem}.png"), img)
        n += 1
    print(f"{n} flow visualisations -> {out_dir}")
    return 0


def cmd_stream(args) -> int:
    """Streaming end-to-end: frames folder → device-state scan → batched
    ROI-gated seg masks, in chunked compiled calls (pipelines/stream.py)."""
    import cv2
    import numpy as np

    from nsof_tpu.config import DATASETS
    from nsof_tpu.device.frame_sim import FrameSimConfig
    from nsof_tpu.pipelines.stream import stream_masks_chunked

    folder = pathlib.Path(args.frames)
    files = sorted(
        [*folder.glob("*.jpg"), *folder.glob("*.png")],
        key=lambda f: int(f.stem) if f.stem.isdigit() else f.stem,
    )
    frames = np.stack(
        [cv2.imread(str(f), cv2.IMREAD_GRAYSCALE) for f in files]
    )
    cfg = DATASETS[args.preset]
    if frames.shape[1:] != (cfg.image_h, cfg.image_w):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, image_h=frames.shape[1], image_w=frames.shape[2],
            window_h=None, window_w=None,
        )
    if args.thres is not None:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, roi=dataclasses.replace(cfg.roi, thres=args.thres)
        )
    sim = FrameSimConfig(
        m=cfg.roi.memsize, n=cfg.roi.memsize, n_substeps=args.substeps
    )
    out = stream_masks_chunked(
        frames, cfg, sim, chunk_pairs=args.chunk_pairs
    )
    out_dir = pathlib.Path(args.out or folder.parent / "stream_masks")
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(out["masks"].shape[0]):
        cv2.imwrite(str(out_dir / f"mask_{files[i+1].stem}.png"),
                    out["masks"][i])
    act = int(np.asarray(out["any_active"]).sum())
    print(
        f"{out['masks'].shape[0]} masks -> {out_dir} "
        f"(active pairs: {act}, mean region "
        f"{float(np.asarray(out['region_pct']).mean()):.1f}%)"
    )
    return 0


def cmd_visualize(args) -> int:
    from nsof_tpu.utils.visualize import visualize_npz

    out = visualize_npz(
        args.npz,
        mode=args.mode,
        value=args.value,
        use_log=args.log,
        fps=args.fps,
        key_every=args.key_every,
        save_mp4=args.mp4,
    )
    print(json.dumps(out, indent=2))
    return 0


def cmd_validate(args) -> int:
    """Benchmark validation / submission writers (evaluate.py:21-197):
    run a flow backend over a Sintel/KITTI/Chairs split and report EPE/F1,
    or write the benchmark's upload files."""
    import numpy as np

    from nsof_tpu.data import flow_datasets as fd
    from nsof_tpu.train import evaluate as ev

    if args.backend == "farneback":
        import cv2

        import jax.numpy as jnp
        from nsof_tpu.ops.farneback import farneback

        def flow_fn(i1, i2):
            g1 = cv2.cvtColor(np.asarray(i1[0], np.uint8),
                              cv2.COLOR_RGB2GRAY)
            g2 = cv2.cvtColor(np.asarray(i2[0], np.uint8),
                              cv2.COLOR_RGB2GRAY)
            return np.asarray(
                farneback(jnp.asarray(g1), jnp.asarray(g2))
            )[None]
    elif args.backend == "raft":
        import jax
        from nsof_tpu.models.convert import pretrained_raft

        model, variables = pretrained_raft(args.torch_ckpt)
        apply = jax.jit(
            lambda a, b: model.apply(
                variables, a, b, iters=args.iters, test_mode=True
            )[1]
        )
        flow_fn = lambda i1, i2: np.asarray(apply(i1, i2))
    else:  # flowformer
        import jax
        from nsof_tpu.models.flowformer.convert import pretrained_flowformer

        model, variables = pretrained_flowformer(args.torch_ckpt)
        apply = jax.jit(lambda a, b: model.apply(variables, a, b)[-1])
        flow_fn = lambda i1, i2: np.asarray(apply(i1, i2))

    if args.submission:
        if args.dataset == "kitti":
            n = ev.create_kitti_submission(flow_fn, args.data_root, args.out)
        else:
            n = ev.create_sintel_submission(
                flow_fn, args.data_root, args.out, dstype=args.dstype
            )
        print(json.dumps({"written": n, "out": args.out}))
        return 0

    if args.dataset == "sintel":
        pairs = fd.scan_sintel(args.data_root, dstype=args.dstype)
    elif args.dataset == "kitti":
        pairs = fd.scan_kitti(args.data_root)
    else:
        pairs = fd.scan_flying_chairs(args.data_root)
    metrics = ev.validate_pairs(flow_fn, pairs, max_pairs=args.max_pairs)
    print(json.dumps({"dataset": args.dataset, **metrics}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nsof_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for kind in ("seg", "track", "predict"):
        p = sub.add_parser(kind)
        _add_scene_args(p)

    p = sub.add_parser("deep")
    _add_scene_args(p)
    p.add_argument("--task", choices=["seg", "track", "predict"],
                   default="seg")
    p.add_argument("--backend", choices=["raft", "flowformer"],
                   default="raft")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--torch-ckpt", default=None,
                   help="reference torch checkpoint (raft-things.pth etc., "
                        "converted via nsof_tpu.models.convert)")
    p.add_argument("--small", action="store_true", default=True)
    p.add_argument("--basic", dest="small", action="store_false")
    p.add_argument("--iters", type=int, default=20)

    p = sub.add_parser("eventsim")
    p.add_argument("--h5", default="driving_data.hdf5")
    p.add_argument("--version", type=int, choices=[1, 2], default=1)
    p.add_argument("--slice_us", type=int, default=1000)
    p.add_argument("--active_v", type=float, default=-6.0)
    p.add_argument("--silent_v", type=float, default=0.0)
    p.add_argument("--polarity", choices=["split", "magnitude"],
                   default="split")
    p.add_argument("--no-video", action="store_true")
    p.add_argument("--synthetic", action="store_true")

    p = sub.add_parser("framesim")
    p.add_argument("--frames", required=True, help="folder of frames")
    p.add_argument("--m", type=int, default=40)
    p.add_argument("--n", type=int, default=40)
    p.add_argument("--th1", type=float, default=0.7)
    p.add_argument("--th2", type=float, default=1.5)
    p.add_argument("--substeps", type=int, default=1000)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=None)
    p.add_argument("--interval", type=int, default=1)
    p.add_argument("--region", default=None, help="y0,x0,y1,x1 inclusive")
    p.add_argument("--out", default=None)

    p = sub.add_parser("flow")
    p.add_argument("--frames", required=True, help="folder of frames")
    p.add_argument("--preset", default="grasp",
                   help="farneback preset: grasp|tabletennis|autodriving|uav")
    p.add_argument("--out", default=None)

    p = sub.add_parser("train")
    p.add_argument("--data-root", required=True,
                   help="folder holding FlyingChairs_release/ "
                        "FlyingThings3D/ Sintel/ KITTI/ HD1k/")
    p.add_argument("--ckpt-root", default="checkpoints")
    p.add_argument("--stage", default=None,
                   help="run a single stage (chairs|things|sintel|kitti); "
                        "default runs the full staged schedule")
    p.add_argument("--steps", type=int, default=None,
                   help="override steps per stage (smoke runs)")
    p.add_argument("--mesh", default=None,
                   help="data×model mesh, e.g. 4x2; default all-data")
    p.add_argument("--small", action="store_true")
    p.add_argument("--val-freq", type=int, default=5000)

    p = sub.add_parser("validate")
    p.add_argument("--dataset", choices=["sintel", "kitti", "chairs"],
                   default="sintel")
    p.add_argument("--data-root", required=True)
    p.add_argument("--dstype", choices=["clean", "final"], default="clean")
    p.add_argument("--backend",
                   choices=["farneback", "raft", "flowformer"],
                   default="farneback")
    p.add_argument("--torch-ckpt", default=None,
                   help="reference .pth for the deep backends")
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--max-pairs", type=int, default=None)
    p.add_argument("--submission", action="store_true",
                   help="write upload files instead of validating")
    p.add_argument("--out", default="submission")

    p = sub.add_parser("stream")
    p.add_argument("--frames", required=True, help="folder of frames")
    p.add_argument("--preset", default="tabletennis",
                   help="dataset preset for ROI/flow params")
    p.add_argument("--thres", type=int, default=None,
                   help="override the activity threshold (the preset's "
                        "THRES was tuned for the reference .mat state)")
    p.add_argument("--chunk-pairs", type=int, default=64)
    p.add_argument("--substeps", type=int, default=1000)
    p.add_argument("--out", default=None)

    p = sub.add_parser("serve")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)

    p = sub.add_parser("visualize")
    p.add_argument("npz")
    p.add_argument("--mode", choices=["abs", "delta", "rel"], default="abs")
    p.add_argument("--value", choices=["resistance", "state"],
                   default="resistance")
    p.add_argument("--log", action="store_true")
    p.add_argument("--fps", type=float, default=None)
    p.add_argument("--key-every", type=int, default=0)
    p.add_argument("--mp4", action="store_true")

    args = ap.parse_args(argv)
    if args.cmd in ("seg", "track", "predict"):
        kind = {"seg": "seg", "track": "track", "predict": "predict"}[args.cmd]
        return cmd_task(kind, args)
    if args.cmd == "deep":
        return cmd_deep(args)
    if args.cmd == "eventsim":
        return cmd_eventsim(args)
    if args.cmd == "framesim":
        return cmd_framesim(args)
    if args.cmd == "flow":
        return cmd_flow(args)
    if args.cmd == "train":
        return cmd_train(args)
    if args.cmd == "validate":
        return cmd_validate(args)
    if args.cmd == "stream":
        return cmd_stream(args)
    if args.cmd == "serve":
        from nsof_tpu.serve import serve

        serve(args.host, args.port)
        return 0
    return cmd_visualize(args)


if __name__ == "__main__":
    sys.exit(main())
