"""Pins the fast-path accuracy audit (VERDICT r2 weak-2 / next-4).

The TPU throughput path (nsof_tpu.ops.farneback_fast) bounds per-level
displacement to ``warp_radius``; scripts/audit_fast_path.py measures, on
every bundled reference scene, the fast path's mask agreement and flow
EPE vs the exact OpenCV-parity path and auto-selects the smallest radius
meeting the floors.  These tests pin the committed audit artifact
(results/fast_audit.json) against the shipped per-preset config so a
regression in either is caught:

- every audited scene's selected radius is what ``DATASETS[scene]``
  ships with;
- at the shipped radius the audit met the floors (mask agreement mean
  >= 0.995, pixel-accuracy delta vs gtmask <= 0.1).
"""

import json
import pathlib

import pytest

from nsof_tpu.config import DATASETS

AUDIT_PATH = (
    pathlib.Path(__file__).resolve().parent.parent
    / "results"
    / "fast_audit.json"
)

AGREEMENT_FLOOR = 0.995
PA_DELTA_MAX = 0.1
SCENES = ("tabletennis", "uav", "uavnew2", "autodriving", "grasp")


def _audit():
    if not AUDIT_PATH.exists():
        pytest.skip("results/fast_audit.json not generated yet")
    return json.loads(AUDIT_PATH.read_text())


def test_every_scene_audited():
    rows = _audit()
    missing = [s for s in SCENES if s not in rows]
    assert not missing, f"scenes missing from fast audit: {missing}"


@pytest.mark.parametrize("scene", SCENES)
def test_shipped_radius_matches_audit_selection(scene):
    rows = _audit()
    row = rows.get(scene)
    if row is None:
        pytest.skip(f"{scene} not audited")
    sel = row["selected_radius"]
    assert sel is not None, (
        f"{scene}: no radius met the audit floors — the fast path must "
        "not ship for this preset without a documented exception"
    )
    assert DATASETS[scene].warp_radius == sel, (
        f"{scene}: config ships warp_radius={DATASETS[scene].warp_radius} "
        f"but the audit selected {sel}"
    )


@pytest.mark.parametrize("scene", SCENES)
def test_shipped_radius_met_floors(scene):
    """Selection policy (scripts/audit_fast_path.py::select_radius):
    'floor' selections meet the absolute agreement floor; 'plateau'
    selections (residual disagreement is radius-independent, i.e. not the
    warp clamp) sit within 2e-4 of the best measured agreement.  Both
    kinds must keep the task-level pixel-accuracy delta under the cap."""
    rows = _audit()
    row = rows.get(scene)
    if row is None:
        pytest.skip(f"{scene} not audited")
    rr = row["radii"][str(DATASETS[scene].warp_radius)]
    if row.get("selection") == "plateau":
        best = max(v["mask_agreement_mean"] for v in row["radii"].values())
        assert rr["mask_agreement_mean"] >= best - 2e-4
    else:
        assert rr["mask_agreement_mean"] >= AGREEMENT_FLOOR
    if "pa_delta" in rr:
        assert rr["pa_delta"] <= PA_DELTA_MAX


def test_config_radii_are_audited_values():
    """Weightless structural check: every dataset preset's radius is one
    the audit sweep actually measures (scripts/audit_fast_path.py RADII)."""
    for name in SCENES:
        assert DATASETS[name].warp_radius in (3, 5, 7)
