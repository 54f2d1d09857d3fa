"""Object detection on neuromorphic ROIs (``optical_flow_yolo.py``).

The reference runs ultralytics YOLOv8 on each ROI crop and on the full
frame, maps region detections back to full-image coordinates, and compares
detection counts/classes/times (run_yolo_on_regions :442-588,
run_yolo_on_full_image :590-682).  Detectors are host-side black boxes, so
this pipeline keeps the ROI computation on device and exposes a pluggable
:class:`Detector` protocol — ``UltralyticsDetector`` when the package and
weights are available (they are optional extras; the reference's
``yolov8n.pt`` is likewise a missing large blob in the repo), plus a
deterministic :class:`ThresholdBlobDetector` standing in for tests and
environments without model weights.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Protocol

import numpy as np

from nsof_tpu.data.scenes import SceneData
from nsof_tpu.ops import roi as roi_ops
from nsof_tpu.utils import reporting

YOLO_CONFIDENCE = 0.25  # optical_flow_yolo.py:83-85
YOLO_IOU_THRESHOLD = 0.45


@dataclasses.dataclass
class Detection:
    bbox: tuple[float, float, float, float]  # x1, y1, x2, y2 full-image
    confidence: float
    class_id: int
    class_name: str


class Detector(Protocol):
    def __call__(self, image_bgr: np.ndarray) -> list[Detection]: ...


class UltralyticsDetector:
    """YOLOv8 via ultralytics, when installed (optional-import guarded the
    same way the reference guards it, optical_flow_yolo.py:34-39)."""

    def __init__(self, weights: str = "yolov8n.pt",
                 conf: float = YOLO_CONFIDENCE,
                 iou: float = YOLO_IOU_THRESHOLD):
        try:
            from ultralytics import YOLO
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "ultralytics is not installed; pass a custom Detector or "
                "install the 'detect' extra"
            ) from e
        self.model = YOLO(weights)
        self.conf = conf
        self.iou = iou

    def __call__(self, image_bgr: np.ndarray) -> list[Detection]:
        results = self.model(
            image_bgr, conf=self.conf, iou=self.iou, verbose=False
        )
        out = []
        for result in results:
            if result.boxes is None:
                continue
            boxes = result.boxes.xyxy.cpu().numpy()
            confs = result.boxes.conf.cpu().numpy()
            classes = result.boxes.cls.cpu().numpy()
            for box, conf, cls in zip(boxes, confs, classes):
                out.append(
                    Detection(tuple(box), float(conf), int(cls),
                              self.model.names[int(cls)])
                )
        return out


COCO_NAMES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep",
    "cow", "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
)


class JaxYoloDetector:
    """TPU-native YOLOv8 behind the :class:`Detector` protocol.

    Runs :mod:`nsof_tpu.models.yolov8` (full architecture in Flax) under
    one jitted forward per image size: ultralytics-style letterbox to a
    static ``imgsz`` square (gray 114 padding), decode + on-device NMS,
    boxes mapped back to source coordinates.  Build from an ultralytics
    checkpoint via :func:`for_checkpoint`, or pass converted variables
    directly (tests use the synthetic state_dict fixture)."""

    def __init__(self, variables, config=None, imgsz: int = 640,
                 conf: float = YOLO_CONFIDENCE,
                 iou: float = YOLO_IOU_THRESHOLD,
                 class_names: tuple[str, ...] = COCO_NAMES):
        import jax

        from nsof_tpu.models import yolov8 as y8

        self.config = config or y8.YoloConfig()
        self.model = y8.YOLOv8(self.config)
        self.variables = variables
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.class_names = class_names

        @jax.jit
        def _run(variables, img):
            outs = self.model.apply(variables, img[None])
            boxes, scores = y8.decode_predictions(
                outs, self.config.num_classes
            )
            post = y8.postprocess(boxes, scores, self.conf, self.iou)
            return jax.tree.map(lambda v: v[0], post)

        self._run = _run

    @classmethod
    def for_checkpoint(cls, path: str, **kw):
        from nsof_tpu.models.yolov8 import pretrained_yolov8

        model, variables = pretrained_yolov8(path)
        return cls(variables, model.config, **kw)

    def __call__(self, image_bgr: np.ndarray) -> list[Detection]:
        h0, w0 = image_bgr.shape[:2]
        # letterbox: scale to fit, center on a 114-gray square canvas
        gain = min(self.imgsz / h0, self.imgsz / w0)
        nh, nw = round(h0 * gain), round(w0 * gain)
        import cv2

        resized = cv2.resize(
            image_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR
        )
        canvas = np.full(
            (self.imgsz, self.imgsz, 3), 114, dtype=np.uint8
        )
        top = (self.imgsz - nh) // 2
        left = (self.imgsz - nw) // 2
        canvas[top : top + nh, left : left + nw] = resized
        img = canvas[..., ::-1].astype(np.float32) / 255.0  # BGR→RGB
        post = self._run(self.variables, img)
        boxes = np.asarray(post["boxes"], np.float32)
        scores = np.asarray(post["scores"], np.float32)
        classes = np.asarray(post["classes"], np.int32)
        valid = np.asarray(post["valid"], bool)
        out = []
        for b, s, c in zip(boxes[valid], scores[valid], classes[valid]):
            x1 = float(np.clip((b[0] - left) / gain, 0, w0))
            y1 = float(np.clip((b[1] - top) / gain, 0, h0))
            x2 = float(np.clip((b[2] - left) / gain, 0, w0))
            y2 = float(np.clip((b[3] - top) / gain, 0, h0))
            name = (self.class_names[int(c)]
                    if int(c) < len(self.class_names) else str(int(c)))
            out.append(Detection((x1, y1, x2, y2), float(s), int(c), name))
        return out


class ThresholdBlobDetector:
    """Deterministic detector for tests / weightless environments: bright
    blobs above a threshold become class-0 detections."""

    def __init__(self, thresh: int = 200, min_area: int = 50):
        self.thresh = thresh
        self.min_area = min_area

    def __call__(self, image_bgr: np.ndarray) -> list[Detection]:
        import cv2

        gray = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2GRAY)
        _, binary = cv2.threshold(gray, self.thresh, 255, cv2.THRESH_BINARY)
        n, _, stats, _ = cv2.connectedComponentsWithStats(binary, 8)
        out = []
        for i in range(1, n):
            x, y, w, h, area = stats[i]
            if area >= self.min_area:
                out.append(
                    Detection((x, y, x + w, y + h), 1.0, 0, "blob")
                )
        return out


@dataclasses.dataclass
class DetectionFrameResult:
    frame: str
    region_detections: list[Detection]
    full_detections: list[Detection]
    region_time_s: float
    full_time_s: float
    region_box: Optional[tuple[int, int, int, int]]


def run_detection(
    scene: SceneData,
    detector: Detector,
    csv_path: Optional[str] = None,
) -> list[DetectionFrameResult]:
    """Detect on ROI crops vs full frames across a scene.

    The ROI comes from the device-state map exactly as in the flow
    pipelines (merged FLAG=2 box); crops are host-side numpy slices because
    detectors are host-side.  Region detections are mapped back to
    full-image coordinates (optical_flow_yolo.py:516-523).
    """
    cfg = scene.cfg
    results = []
    report = None
    if csv_path:
        report = reporting.CsvReport(
            csv_path,
            reporting.SEG_COLUMNS
            + [
                "YOLO_Region_Time",
                "YOLO_Full_Time",
                "YOLO_Time_Improvement",
                "YOLO_Time_Improvement_Percent",
                "YOLO_Region_Detections_Count",
                "YOLO_Full_Detections_Count",
                "YOLO_Region_Classes",
                "YOLO_Region_Confidences",
                "YOLO_Full_Classes",
                "YOLO_Full_Confidences",
            ],
        )

    for i in range(scene.num_pairs):
        mem2 = scene.mem_gray[i + 1]
        frame = scene.frames_bgr[i + 1]
        r = roi_ops.roi_boxes(mem2, cfg.image_h, cfg.image_w, cfg.roi)
        region_dets: list[Detection] = []
        region_time = 0.0
        region_box = None
        if bool(r["any_active"]):
            x0, y0, x1, y1 = (int(v) for v in np.asarray(r["merged"]))
            region_box = (x0, y0, x1, y1)
            crop = frame[y0:y1, x0:x1]
            if crop.size:
                t0 = time.perf_counter()
                dets = detector(crop)
                region_time = time.perf_counter() - t0
                for d in dets:
                    bx = d.bbox
                    region_dets.append(
                        dataclasses.replace(
                            d,
                            bbox=(bx[0] + x0, bx[1] + y0,
                                  bx[2] + x0, bx[3] + y0),
                        )
                    )
        t0 = time.perf_counter()
        full_dets = detector(frame)
        full_time = time.perf_counter() - t0

        res = DetectionFrameResult(
            frame=scene.names[i + 1],
            region_detections=region_dets,
            full_detections=full_dets,
            region_time_s=region_time,
            full_time_s=full_time,
            region_box=region_box,
        )
        results.append(res)
        if report:
            imp = full_time - region_time
            report.add(
                {
                    "Frame_Pair": f"{scene.names[i+1]}-{scene.names[i]}",
                    "YOLO_Region_Time": f"{region_time:.4f}",
                    "YOLO_Full_Time": f"{full_time:.4f}",
                    "YOLO_Time_Improvement": f"{imp:.4f}",
                    "YOLO_Time_Improvement_Percent": (
                        f"{100 * imp / max(full_time, 1e-9):.2f}"
                    ),
                    "YOLO_Region_Detections_Count": len(region_dets),
                    "YOLO_Full_Detections_Count": len(full_dets),
                    "YOLO_Region_Classes": ";".join(
                        d.class_name for d in region_dets
                    ),
                    "YOLO_Region_Confidences": ";".join(
                        f"{d.confidence:.2f}" for d in region_dets
                    ),
                    "YOLO_Full_Classes": ";".join(
                        d.class_name for d in full_dets
                    ),
                    "YOLO_Full_Confidences": ";".join(
                        f"{d.confidence:.2f}" for d in full_dets
                    ),
                }
            )
    return results
