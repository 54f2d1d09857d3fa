"""Fast-path tests: batched farneback (XLA + Pallas), windowed correlation,
detection pipeline, flow_viz, visualize, CLI."""

import json
import pathlib

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsof_tpu.ops.farneback import FarnebackParams, farneback
from nsof_tpu.ops.farneback_fast import (
    farneback_fast,
    update_matrices_fast,
    update_matrices_pallas,
)

ON_TPU = jax.default_backend() == "tpu"


def _shifted_pair(rng, b=8, h=96, w=128, dx=-1.7, dy=2.4):
    base = cv2.GaussianBlur(
        (rng.random((h + 40, w + 40)) * 255).astype(np.float32), (0, 0), 2.5
    )
    img0 = np.stack([base[20 : 20 + h, 20 : 20 + w]] * b).astype(np.uint8)
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    i1 = cv2.warpAffine(base, m, (w + 40, h + 40))
    img1 = np.stack([i1[20 : 20 + h, 20 : 20 + w]] * b).astype(np.uint8)
    return img0, img1


@pytest.mark.slow
def test_fast_matches_exact_for_small_flows(rng):
    p = FarnebackParams(0.5, 2, 9, 2, 5, 1.1)
    img0, img1 = _shifted_pair(rng)
    exact = np.asarray(farneback(jnp.asarray(img0[0]), jnp.asarray(img1[0]), p))
    fast = np.asarray(
        farneback_fast(jnp.asarray(img0), jnp.asarray(img1), p, 4, "xla")
    )[0]
    err = np.linalg.norm(fast - exact, axis=-1)
    assert err.mean() < 0.05
    assert np.median(err) < 0.02


@pytest.mark.skipif(not ON_TPU, reason="Pallas kernel is TPU-only")
def test_pallas_update_matrices_bit_exact(rng):
    h, w, b = 32, 64, 128
    r0 = jnp.asarray(rng.normal(size=(h, w, b, 5)).astype(np.float32))
    r1 = jnp.asarray(rng.normal(size=(h, w, b, 5)).astype(np.float32))
    fl = jnp.asarray((rng.random((h, w, b, 2)) * 4 - 2).astype(np.float32))
    ref = np.asarray(update_matrices_fast(r0, r1, fl, 2))
    got = np.asarray(update_matrices_pallas(r0, r1, fl, 2))
    np.testing.assert_array_equal(got, ref)


def test_corr_lookup_dense_matches_gather(rng):
    """The gather-free hat-selector corr_lookup must equal the naive
    bilinear-gather formulation (grid_sample zero padding) everywhere,
    including coords off the volume edge (where zero padding kicks in)."""
    from nsof_tpu.models.raft import (
        all_pairs_correlation,
        bilinear_sample,
        build_corr_pyramid,
        corr_lookup,
    )

    b, h, w, c = 2, 8, 10, 16
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    # coords deliberately spill past the edges so hats must zero out
    coords = jnp.asarray(
        (rng.random((b, h, w, 2)) * [w + 6, h + 6] - 3).astype(np.float32)
    )
    r = 3
    pyramid = build_corr_pyramid(all_pairs_correlation(f1, f2), 3)
    got = np.asarray(corr_lookup(pyramid, coords, r))

    # naive gather reference (the pre-round-5 implementation)
    n = 2 * r + 1
    delta = np.stack(
        np.meshgrid(np.linspace(-r, r, n), np.linspace(-r, r, n),
                    indexing="ij"),
        axis=-1,
    )
    outs = []
    for lvl, corr in enumerate(pyramid):
        centroid = coords.reshape(b * h * w, 1, 1, 2) / (2**lvl)
        cx = centroid[..., 0] + delta[None, ..., 0]
        cy = centroid[..., 1] + delta[None, ..., 1]
        sampled = bilinear_sample(corr, jnp.asarray(cx), jnp.asarray(cy))
        outs.append(np.asarray(sampled).reshape(b, h, w, n * n))
    want = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_windowed_correlation_matches_allpairs_lookup(rng):
    """The windowed correlation must agree with sampling the full all-pairs
    volume (the CorrBlock path) at integer-window offsets."""
    from nsof_tpu.models.raft import (
        all_pairs_correlation,
        bilinear_sample,
        build_corr_pyramid,
        corr_lookup,
    )
    from nsof_tpu.ops.correlation import windowed_correlation

    b, h, w, c = 2, 8, 10, 16
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    coords = jnp.asarray(
        (rng.random((b, h, w, 2)) * [w - 1, h - 1]).astype(np.float32)
    )
    r = 2
    got = np.asarray(windowed_correlation(f1, f2, coords, r)) / np.sqrt(c)
    # windowed_correlation emits the natural (dy outer, dx inner) order;
    # corr_lookup reproduces CorrBlock's transposed quirk (core/corr.py:36-43)
    n = 2 * r + 1
    got = got.reshape(b, h, w, n, n).swapaxes(-1, -2).reshape(b, h, w, -1)

    pyramid = build_corr_pyramid(all_pairs_correlation(f1, f2), 1)
    want = np.asarray(corr_lookup(pyramid, coords, r))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_windowed_correlation_mxu_matches_jnp(rng):
    from nsof_tpu.ops.correlation import (
        windowed_correlation,
        windowed_correlation_mxu,
    )

    b, h, w, c = 2, 16, 16, 64
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    coords = jnp.asarray(
        (rng.random((b, h, w, 2)) * [w - 1, h - 1]).astype(np.float32)
    )
    ref = np.asarray(windowed_correlation(f1, f2, coords, 3))
    got = np.asarray(
        windowed_correlation_mxu(f1, f2, coords, 3, tile=128)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_detection_pipeline_with_blob_detector(tmp_path):
    from nsof_tpu.pipelines.detection import (
        ThresholdBlobDetector,
        run_detection,
    )
    from tests.conftest import REFERENCE_DATA, reference_data_available

    if not reference_data_available():
        pytest.skip("no reference data")
    from nsof_tpu.data import load_scene

    scene = load_scene(REFERENCE_DATA, "tabletennis", max_frames=6)
    results = run_detection(
        scene, ThresholdBlobDetector(thresh=150),
        csv_path=tmp_path / "det.csv",
    )
    assert len(results) == scene.num_pairs
    assert (tmp_path / "det.csv").exists()
    # region detections stay inside the region box
    for r in results:
        if r.region_box:
            x0, y0, x1, y1 = r.region_box
            for d in r.region_detections:
                assert d.bbox[0] >= x0 - 1 and d.bbox[2] <= x1 + 1


def test_flow_viz_color_wheel():
    from nsof_tpu.utils.flow_viz import flow_to_image, make_colorwheel

    wheel = make_colorwheel()
    assert wheel.shape == (55, 3)
    flow = np.zeros((8, 8, 2), np.float32)
    flow[:4, :, 0] = 1.0
    img = np.asarray(flow_to_image(jnp.asarray(flow)))
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # rightward flow maps into the red-ish sector of the wheel
    assert img[0, 0, 0] > img[0, 0, 2]


def test_visualize_npz_outputs(tmp_path):
    from nsof_tpu.utils.visualize import visualize_npz

    res = np.linspace(2e6, 2e5, 5 * 6 * 6).reshape(5, 6, 6)
    npz = tmp_path / "sim.V1.npz"
    np.savez_compressed(npz, w_final=np.full((6, 6), 0.7),
                        resistances=res.astype(np.float32))
    out = visualize_npz(npz, mode="delta", value="state", key_every=2)
    assert pathlib.Path(out["w_final"]).exists()
    kdir = pathlib.Path(out["keyframes"])
    manifest = json.loads((kdir / "manifest.json").read_text())
    assert len(manifest["frames"]) == 3


def test_cli_eventsim_synthetic(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from nsof_tpu import cli

    rc = cli.main(
        ["eventsim", "--synthetic", "--version", "1", "--no-video",
         "--slice_us", "5000"]
    )
    assert rc == 0
    assert (tmp_path / "synthetic.V1.npz").exists()
    assert (tmp_path / "synthetic.V1.json.gz").exists()


@pytest.mark.skipif(not ON_TPU, reason="exercises the TPU kernel dispatch")
def test_auto_mode_falls_back_for_large_poly_n(rng):
    """uav/autodriving presets use poly_n=10 — beyond the fused kernels'
    8-row halo slab — so 'auto' must route them to the separable path
    instead of tripping the Pallas assert (regression: audit crash)."""
    from nsof_tpu.ops.farneback import PRESETS

    img0, img1 = _shifted_pair(rng, b=128, h=64, w=128, dx=-1.0, dy=0.5)
    out = farneback_fast(
        jnp.asarray(img0), jnp.asarray(img1), PRESETS["uav"], 3, "auto"
    )
    assert out.shape == (128, 64, 128, 2)
    assert bool(jnp.isfinite(out).all())
