"""Typed configuration replacing the reference's three config tiers.

The reference configures via (1) module-level UPPERCASE constants with
commented per-dataset alternates (optical_flow_seg.py:24-112), (2) argparse
CLIs, (3) yacs CfgNode trees for FlowFormer.  Here a single frozen-dataclass
hierarchy covers all of it, with per-dataset presets mirroring
``data/*/Parameters.txt``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from nsof_tpu.ops.farneback import PRESETS as FB_PRESETS, FarnebackParams
from nsof_tpu.ops.roi import RoiConfig


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    """Task-head parameters shared by seg/tracking/prediction."""

    seg_th: float = 1.0  # SEG_TH (optical_flow_seg.py:49)
    morph_ksize: int = 10  # elliptical SE size for the seg head (:349)
    morph_iters: int = 5  # dilate+erode repetitions (:350)
    close_ksize: int = 3  # tracking head MORPH_CLOSE SE (optical_flow_ob.py:344)
    min_box_area: int = 500  # tracking contour-area filter (:351)
    nms_iou: float = 0.2  # tracking NMS threshold (:373)
    max_boxes: int = 32  # static slots for tracking boxes


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """One dataset's full pipeline configuration."""

    name: str
    image_h: int
    image_w: int
    roi: RoiConfig = RoiConfig()
    fb: FarnebackParams = FarnebackParams()
    head: HeadConfig = HeadConfig()
    # Static ROI-window size (rounded-up max ROI over the dataset); the
    # idiomatic-TPU replacement for the reference's dynamic crops.  None ⇒
    # full image (always correct, no speedup).
    window_h: Optional[int] = None
    window_w: Optional[int] = None
    # FLAG=1 separate-regions mode: static per-component window (sized to
    # the dataset's max component box + EXTEND margins) and the
    # reference's MERGE_FLAG (True on every bundled FLAG=1 dataset).
    sep_window_h: Optional[int] = None
    sep_window_w: Optional[int] = None
    merge_flag: bool = True
    offset: int = 0  # OFFSET into the state matrix (optical_flow_seg.py:37)
    # Audited per-level warp radius for the fast Farnebäck path (see the
    # accuracy contract in nsof_tpu/ops/farneback_fast.py and the per-scene
    # audit in scripts/audit_fast_path.py / results/fast_audit.json).
    warp_radius: int = 3

    @property
    def win_shape(self) -> tuple[int, int]:
        return (
            self.window_h or self.image_h,
            self.window_w or self.image_w,
        )

    @property
    def sep_win_shape(self) -> tuple[int, int]:
        return (
            self.sep_window_h or self.win_shape[0],
            self.sep_window_w or self.win_shape[1],
        )


def _roi(memsize, thres, mode=2, k_max=16):
    return RoiConfig(memsize=memsize, thres=thres, mode=mode, k_max=k_max)


# Image sizes verified from data/*/RGB; MEMSIZE/THRES from Parameters.txt;
# grid shapes from the bundled constructed_3D_matrix.mat files.
DATASETS = {
    "grasp": PipelineConfig(
        name="grasp",
        image_h=1920,
        image_w=1080,
        roi=_roi(80, 250),
        fb=FB_PRESETS["grasp"],
        # scripts/scan_roi_sizes.py: the merged grasp ROI reaches
        # 1920×840, so the static window must be the full frame for
        # reference-exact output (separate-region mode is the road to a
        # smaller window on this scene)
        window_h=None,
        window_w=None,
    ),
    "tabletennis": PipelineConfig(
        name="tabletennis",
        image_h=160,
        image_w=160,
        roi=_roi(10, 245),
        fb=FB_PRESETS["tabletennis"],
        window_h=160,
        window_w=160,
        # audited radius (results/fast_audit.json): r=3 passes agreement
        # but its PA delta (0.17) exceeds the 0.1 cap; r=5 meets both
        warp_radius=5,
    ),
    # FLAG=1 datasets (Parameters.txt: "FLAG = 1 (MERGE_FLAG = True)") —
    # per-component flow, union-box head.  Their 4×4 / 15×15 grids make a
    # single component's box potentially frame-sized, so the separate
    # window defaults to the full frame (exactness first).
    "autodriving": PipelineConfig(
        name="autodriving",
        image_h=801,
        image_w=801,
        roi=_roi(200, 114, mode=1),
        fb=FB_PRESETS["autodriving"],
        window_h=801,
        window_w=801,
        warp_radius=3,  # audited: agreement 0.9992, PA delta ok at r=3
    ),
    "uav": PipelineConfig(
        name="uav",
        image_h=161,
        image_w=161,
        roi=_roi(40, 114, mode=1),
        fb=FB_PRESETS["uav"],
        window_h=161,
        window_w=161,
        # audited: agreement plateaus at 0.9937 for every radius (the
        # residual is not the warp clamp); PA delta 0.06 — plateau select
        warp_radius=3,
    ),
    "uavnew2": PipelineConfig(
        name="uavnew2",
        image_h=600,
        image_w=600,
        roi=_roi(40, 114, mode=1),
        fb=FB_PRESETS["uavnew2"],
        window_h=600,
        window_w=600,
        warp_radius=3,  # audited: agreement 0.9999 at r=3
    ),
}

# Optional FLAG=1 preset for grasp (the reference runs grasp with FLAG=2,
# but its merged ROI reaches 1920×840 while no single component exceeds
# 240×240 px + 20 px EXTENDs over the bundled scene — separate-regions
# mode replaces the full-frame window with 320×320 per-component windows,
# ~95 % less flow work).  merge_flag=False keeps the head per-region too.
DATASETS["grasp_sep"] = dataclasses.replace(
    DATASETS["grasp"],
    name="grasp_sep",
    roi=_roi(80, 250, mode=1, k_max=8),
    sep_window_h=320,
    sep_window_w=320,
    merge_flag=False,
)
