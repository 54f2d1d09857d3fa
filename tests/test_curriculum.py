"""Staged-curriculum tests (fetch_dataloader stage mixes +
train_standard.sh schedule, VERDICT r2 item 5).

The spec tables are checked against the reference values; the driver is
exercised end-to-end on synthetic stand-in datasets via the scanner
registry (no multi-hundred-GB benchmark downloads needed)."""

import numpy as np
import pytest

from nsof_tpu.data import flow_datasets as fd
from nsof_tpu.train.curriculum import (
    FLOWFORMER_STAGES,
    RAFT_STANDARD_STAGES,
    SourceSpec,
    StageSpec,
    build_stage_items,
    mixed_batch_iterator,
)
from tests.conftest import run_in_cpu_subprocess


def test_standard_stage_table_matches_reference():
    """Schedules/aug params mirror train_standard.sh:3-6 and
    core/datasets.py:201-231 exactly."""
    by_name = {s.name: s for s in RAFT_STANDARD_STAGES}
    assert list(by_name) == ["chairs", "things", "sintel", "kitti"]

    chairs = by_name["chairs"]
    assert (chairs.num_steps, chairs.batch_size, chairs.lr) == (
        100_000, 10, 4e-4)
    assert chairs.image_size == (368, 496) and chairs.wdecay == 1e-4
    (src,) = chairs.sources
    assert (src.min_scale, src.max_scale, src.do_flip) == (-0.1, 1.0, True)

    sintel = by_name["sintel"]
    weights = {s.name: s.weight for s in sintel.sources}
    assert weights == {
        "sintel_clean": 100, "sintel_final": 100,
        "kitti": 200, "hd1k": 5, "things_clean": 1,
    }
    kitti_src = next(s for s in sintel.sources if s.name == "kitti")
    assert kitti_src.sparse and (kitti_src.min_scale,
                                 kitti_src.max_scale) == (-0.3, 0.5)
    hd1k_src = next(s for s in sintel.sources if s.name == "hd1k")
    assert hd1k_src.sparse and (hd1k_src.min_scale,
                                hd1k_src.max_scale) == (-0.5, 0.2)
    assert sintel.gamma == 0.85 and sintel.wdecay == 1e-5
    assert sintel.restore_from == "things"

    kitti = by_name["kitti"]
    assert kitti.num_steps == 50_000 and kitti.lr == 1e-4
    assert not kitti.sources[0].do_flip and kitti.sources[0].sparse
    assert kitti.restore_from == "sintel"


def test_build_stage_items_weights_and_aug(rng):
    """Replication weights multiply pair counts; each item carries its
    source's augmentor (the 100*clean + 200*kitti concat semantics)."""
    data_a = fd.synthetic_affine_dataset(rng, n=3, size=(64, 64))
    data_b = fd.synthetic_affine_dataset(rng, n=2, size=(64, 64))
    stage = StageSpec(
        name="mix",
        sources=(
            SourceSpec("a", 4, -0.2, 0.6, True),
            SourceSpec("b", 10, -0.5, 0.2, False, sparse=True),
        ),
        num_steps=10, batch_size=2, lr=1e-4,
        image_size=(48, 48), wdecay=1e-4,
    )
    items = build_stage_items(
        stage, {"a": lambda: data_a, "b": lambda: data_b}
    )
    assert len(items) == 3 * 4 + 2 * 10
    augs = {(aug.min_scale, aug.do_flip, aug.sparse) for _, aug in items}
    assert augs == {(-0.2, True, False), (-0.5, False, True)}
    assert all(aug.crop_size == (48, 48) for _, aug in items)

    with pytest.raises(KeyError):
        build_stage_items(stage, {"a": lambda: data_a})


def test_mixed_batch_iterator_shapes(rng):
    data = fd.synthetic_affine_dataset(rng, n=4, size=(72, 72))
    stage_aug = SourceSpec("x", 1, -0.1, 0.1, True).augmentor((64, 64))
    items = [(d, stage_aug) for d in data]
    batches = list(mixed_batch_iterator(items, 2, rng, epochs=1))
    assert len(batches) == 2
    assert batches[0]["image1"].shape == (2, 64, 64, 3)
    assert batches[0]["flow"].shape == (2, 64, 64, 2)
    assert batches[0]["valid"].shape == (2, 64, 64)


def test_scan_flying_things_layout(tmp_path):
    import cv2

    idir = tmp_path / "frames_cleanpass" / "TRAIN" / "A" / "0000" / "left"
    fdir_f = tmp_path / "optical_flow" / "TRAIN" / "A" / "0000" / \
        "into_future" / "left"
    fdir_p = tmp_path / "optical_flow" / "TRAIN" / "A" / "0000" / \
        "into_past" / "left"
    for d in (idir, fdir_f, fdir_p):
        d.mkdir(parents=True)
    for i in range(3):
        cv2.imwrite(str(idir / f"{i:04d}.png"), np.zeros((8, 8, 3), np.uint8))
    for i in range(3):
        with open(fdir_f / f"{i:04d}.pfm", "wb") as f:
            f.write(b"PF\n8 8\n-1.0\n" + np.zeros(8 * 8 * 3, "<f4").tobytes())
        with open(fdir_p / f"{i:04d}.pfm", "wb") as f:
            f.write(b"PF\n8 8\n-1.0\n" + np.zeros(8 * 8 * 3, "<f4").tobytes())
    pairs = fd.scan_flying_things(tmp_path, "frames_cleanpass")
    # 2 future pairs (i, i+1) + 2 past pairs (i+1, i)
    assert len(pairs) == 4
    fut = pairs[0]
    past = pairs[2]
    assert fut.img1_path.endswith("0000.png")
    assert past.img1_path.endswith("0001.png")  # reversed order
    assert past.flow_path.endswith("0001.pfm")  # backward flow of i+1


def test_scan_hd1k_layout(tmp_path):
    import cv2

    (tmp_path / "hd1k_flow_gt" / "flow_occ").mkdir(parents=True)
    (tmp_path / "hd1k_input" / "image_2").mkdir(parents=True)
    for seq in range(2):
        for i in range(3):
            cv2.imwrite(
                str(tmp_path / "hd1k_input" / "image_2"
                    / f"{seq:06d}_{i:04d}.png"),
                np.zeros((8, 8, 3), np.uint8))
            fd.write_kitti_flow(
                tmp_path / "hd1k_flow_gt" / "flow_occ"
                / f"{seq:06d}_{i:04d}.png",
                np.zeros((8, 8, 2), np.float32))
    pairs = fd.scan_hd1k(tmp_path)
    assert len(pairs) == 4  # 2 per sequence (len(flows)-1)


def test_ff_experiment_trees_match_reference():
    """FF_EXPERIMENTS value-for-value vs the reference config trees
    (configs/{default,things,sintel,kitti,things_eval,small_things_eval,
    submission,things_flowformer_sharp}.py)."""
    from nsof_tpu.models.flowformer.config import (
        FF_EXPERIMENTS,
        get_experiment,
    )

    assert set(FF_EXPERIMENTS) == {
        "chairs", "things", "sintel", "kitti", "things_eval",
        "small_things_eval", "submission", "things_sharp",
    }

    # configs/default.py:4-62 (the chairs stage, train_FlowFormer.py:146)
    c = get_experiment("chairs")
    assert (c.batch_size, c.image_size, c.val_freq) == (8, (368, 496), 5000)
    assert c.canonical_lr == 25e-5 and c.restore_ckpt is None
    assert c.gamma == 0.8 and c.adamw_decay == 1e-4
    assert c.model.decoder_depth == 12

    # configs/things.py:4-61
    t = get_experiment("things")
    assert (t.gamma, t.batch_size, t.image_size) == (0.8, 6, (432, 960))
    assert t.restore_ckpt == "chairs" and t.add_noise
    assert t.num_steps == 120_000 and t.canonical_lr == 12.5e-5
    assert t.adamw_decay == 1e-4 and t.max_flow == 400.0
    assert (t.clip, t.epsilon) == (1.0, 1e-8)

    # configs/sintel.py: gamma 0.85, restores things, decay 1e-5
    s = get_experiment("sintel")
    assert s.gamma == 0.85 and s.restore_ckpt == "things"
    assert s.adamw_decay == 1e-5 and s.num_steps == 120_000

    # configs/kitti.py: 50k steps, val_freq 499999999, restores sintel
    k = get_experiment("kitti")
    assert k.num_steps == 50_000 and k.val_freq == 499_999_999
    assert k.restore_ckpt == "sintel" and k.gamma == 0.85

    # configs/things_eval.py: batch 1, no noise, depth-32 decoder
    e = get_experiment("things_eval")
    assert e.batch_size == 1 and not e.add_noise
    assert e.model.decoder_depth == 32 and e.eval_ckpt == "things"

    # configs/small_things_eval.py:25-44 — the FlowFormer-small arch
    sm = get_experiment("small_things_eval").model
    assert (sm.cost_latent_token_num, sm.cost_latent_dim) == (4, 32)
    assert sm.encoder_depth == 1 and sm.vert_c_dim == 0
    assert sm.cnet == "basic" and sm.fnet == "basic"
    assert sm.decoder_depth == 32

    # configs/submission.py loads the sintel checkpoint
    assert get_experiment("submission").eval_ckpt == "sintel"

    # configs/things_flowformer_sharp.py: the 400×720 crop
    assert get_experiment("things_sharp").image_size == (400, 720)

    with pytest.raises(KeyError):
        get_experiment("nope")


def test_flowformer_stage_table():
    """FLOWFORMER_STAGES chains chairs→things→sintel→kitti with the
    experiment trees' schedules and fetch_dataloader's mixes."""
    by_name = {s.name: s for s in FLOWFORMER_STAGES}
    assert list(by_name) == ["ff_chairs", "ff_things", "ff_sintel",
                             "ff_kitti"]
    assert all(s.model == "flowformer" for s in FLOWFORMER_STAGES)
    assert all(s.twins_lr_factor == 0.05 for s in FLOWFORMER_STAGES)

    ch = by_name["ff_chairs"]
    assert (ch.batch_size, ch.lr, ch.image_size) == (8, 25e-5, (368, 496))
    assert ch.restore_from is None and ch.ff_experiment == "chairs"

    th = by_name["ff_things"]
    assert th.restore_from == "ff_chairs" and th.image_size == (432, 960)
    assert {s.name for s in th.sources} == {"things_clean", "things_final"}

    si = by_name["ff_sintel"]
    assert si.restore_from == "ff_things"
    assert {s.name: s.weight for s in si.sources} == {
        "sintel_clean": 100, "sintel_final": 100,
        "kitti": 200, "hd1k": 5, "things_clean": 1,
    }
    assert si.gamma == 0.85 and si.wdecay == 1e-5

    ki = by_name["ff_kitti"]
    assert ki.restore_from == "ff_sintel" and ki.num_steps == 50_000
    assert not ki.sources[0].do_flip and ki.sources[0].sparse


@pytest.mark.slow
def test_ff_curriculum_stage_hand_off(tmp_path):
    """A tiny FlowFormer stage chain on synthetic sources: stage 2 must
    start from stage 1's weights (the restore_ckpt chain of
    train_FlowFormer.py:60-62 across configs/{things,sintel}.py)."""
    run_in_cpu_subprocess(
        f"""
import numpy as np
import jax
from nsof_tpu.data import flow_datasets as fd
from nsof_tpu.models.flowformer import FlowFormerConfig
from nsof_tpu.parallel.mesh import make_mesh
from nsof_tpu.train.curriculum import (
    SourceSpec, StageSpec, run_curriculum)

rng = np.random.default_rng(0)
data = fd.synthetic_affine_dataset(rng, n=8, size=(96, 96), max_shift=3)
scanners = {{'synth': lambda: data}}
tiny = FlowFormerConfig(decoder_depth=2, encoder_depth=1,
                        cnet='basic', fnet='basic')
stages = (
    StageSpec('f1', (SourceSpec('synth', 1, -0.1, 0.1, True),),
              num_steps=2, batch_size=4, lr=1e-4,
              image_size=(64, 64), wdecay=1e-4,
              model='flowformer', twins_lr_factor=0.05),
    # zero-step stage: its params must BE f1's — the hand-off is real
    StageSpec('f2', (SourceSpec('synth', 1, -0.1, 0.1, True),),
              num_steps=0, batch_size=4, lr=5e-5,
              image_size=(64, 64), wdecay=1e-5, gamma=0.85,
              model='flowformer', twins_lr_factor=0.05,
              restore_from='f1'),
)
mesh = make_mesh(8, model_parallel=2)  # dp=4 matches batch_size=4
results = run_curriculum(
    mesh, None, {str(tmp_path)!r}, stages=stages, scanners=scanners,
    raft_cfg=tiny, val_freq=100)
assert int(results['f1'].step) == 2
same = jax.tree.map(
    lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
    results['f2'].params, results['f1'].params)
assert all(jax.tree.leaves(same)), 'FF restore_from did not hand off'
print('ff curriculum ok')
""",
        timeout=900,
    )


@pytest.mark.slow
def test_curriculum_two_stages_hand_off(tmp_path):
    """Two tiny stages on synthetic sources over a dp×tp mesh: stage 2
    must start from stage 1's weights (the --restore_ckpt chain), and both
    stages must produce checkpoints."""
    run_in_cpu_subprocess(
        f"""
import numpy as np
import jax
from nsof_tpu.data import flow_datasets as fd
from nsof_tpu.models.raft import RaftConfig
from nsof_tpu.parallel.mesh import make_mesh
from nsof_tpu.train.curriculum import (
    SourceSpec, StageSpec, run_curriculum)

rng = np.random.default_rng(0)
data = fd.synthetic_affine_dataset(rng, n=8, size=(96, 96), max_shift=3)
scanners = {{'synthA': lambda: data, 'synthB': lambda: data[:4]}}
stages = (
    StageSpec('s1', (SourceSpec('synthA', 1, -0.1, 0.1, True),),
              num_steps=2, batch_size=4, lr=1e-4,
              image_size=(64, 64), wdecay=1e-4),
    StageSpec('s2', (SourceSpec('synthA', 1, -0.1, 0.1, True),
                     SourceSpec('synthB', 3, -0.1, 0.1, False)),
              num_steps=2, batch_size=4, lr=5e-5,
              image_size=(64, 64), wdecay=1e-4, restore_from='s1'),
    # zero-step stage: its final params must BE s1's final params —
    # proves the restore_from hand-off is real, not a fresh init
    StageSpec('s3', (SourceSpec('synthB', 1, -0.1, 0.1, True),),
              num_steps=0, batch_size=4, lr=5e-5,
              image_size=(64, 64), wdecay=1e-4, restore_from='s1'),
)
mesh = make_mesh(8, model_parallel=2)
results = run_curriculum(
    mesh, None, {str(tmp_path)!r}, stages=stages, scanners=scanners,
    raft_cfg=RaftConfig(small=True, iters=2), val_freq=100)
assert set(results) == {{'s1', 's2', 's3'}}
# both trained stages advanced their step counters
assert int(results['s1'].step) == 2 and int(results['s2'].step) == 2
same = jax.tree.map(
    lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
    results['s3'].params, results['s1'].params)
assert all(jax.tree.leaves(same)), 'restore_from did not hand weights off'
diff = jax.tree.map(
    lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
    results['s2'].params, results['s1'].params)
assert not all(jax.tree.leaves(diff)), 's2 training was a no-op'
import pathlib
for name in ('s1', 's2'):
    assert any((pathlib.Path({str(tmp_path)!r}) / name).iterdir()), name
print('curriculum ok')
""",
        timeout=900,
    )
