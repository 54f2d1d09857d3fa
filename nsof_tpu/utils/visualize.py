"""Visualisation of event-simulation results (npz keyframes/animation).

Feature-parity replacement for ``eventsim/visualize_npz_keyframes.py``:
given a result npz (``w_final`` + decimated ``resistances`` history, as
written by :func:`nsof_tpu.device.io.save_sim_npz`) it renders

- a final-state image,
- keyframes every N animation frames with a ``manifest.json``,
- an MP4/GIF animation,
- a standalone colorbar image with the animation's normalisation,

in resistance space or state space (w = 1 − ln(R/Ron)/λ), with ``abs`` /
``delta`` / ``rel`` modes and optional log10 scaling.  Uses matplotlib when
present, with an OpenCV fallback (JET colormap) mirroring the reference's
degradation path (visualize_npz_keyframes.py:3-12,68-78).
"""

from __future__ import annotations

import gzip
import json
import pathlib
from typing import Optional

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except Exception:  # pragma: no cover
    plt = None
    HAVE_MPL = False


def load_metadata(npz_path: pathlib.Path) -> dict:
    meta_path = npz_path.with_suffix(".json.gz")
    if not meta_path.exists():
        return {}
    try:
        with gzip.open(meta_path, "rt") as fp:
            return json.load(fp)
    except Exception:
        return {}


def resistance_to_state(r: np.ndarray, ron: float, roff: float) -> np.ndarray:
    """w = 1 − ln(R/Ron)/λ, λ = ln(Roff/Ron)."""
    lam = float(np.log(roff / ron))
    return 1.0 - np.log(np.maximum(r / ron, 1e-30)) / lam


def _render_frame_u8(frame, vmin, vmax):
    import cv2

    norm = (frame - vmin) / (vmax - vmin + 1e-12)
    u8 = np.clip(norm * 255.0, 0, 255).astype(np.uint8)
    return cv2.applyColorMap(u8, cv2.COLORMAP_JET)


def _prepare_series(resistances, meta, value: str, mode: str, use_log: bool):
    if value == "state":
        params = meta.get("params") or {}
        ron = float(params.get("r_on", params.get("Ron", 1.0)))
        roff = float(params.get("r_off", params.get("Roff", 2.0)))
        base = resistance_to_state(resistances, ron, roff)
        label = "State w (0-1)"
        sign = 1.0
    else:
        base = resistances
        label = "Resistance (Ohm)"
        sign = -1.0  # resistance falls as the device is driven
    b0 = base[0]
    eps = 1e-9
    if mode == "abs":
        data = base
    elif mode == "delta":
        data = sign * (base - b0)
        label = f"delta {label}"
    elif mode == "rel":
        data = sign * (base - b0) / (np.abs(b0) + eps)
        label = f"relative change of {label}"
    else:
        raise ValueError(f"unknown mode {mode!r}")
    if use_log:
        data = np.log10(np.maximum(data, eps))
        label = f"log10({label})"
    return data, label


def visualize_npz(
    npz_path: str | pathlib.Path,
    mode: str = "abs",
    value: str = "resistance",
    use_log: bool = False,
    fps: Optional[float] = None,
    key_every: int = 0,
    key_dir: Optional[pathlib.Path] = None,
    save_colorbar: bool = True,
    save_mp4: bool = False,
) -> dict:
    """Render all requested artifacts; returns a dict of output paths."""
    npz_path = pathlib.Path(npz_path)
    data = np.load(npz_path)
    if "w_final" not in data or "resistances" not in data:
        raise KeyError(f"{npz_path} missing 'w_final'/'resistances'")
    w_final = data["w_final"]
    resistances = data["resistances"]
    meta = load_metadata(npz_path)
    if fps is None:
        fps = float(meta.get("fps", 30.0))

    out: dict[str, str] = {}

    # final-state image
    w_path = npz_path.with_suffix(".w_final.png")
    if HAVE_MPL:
        fig, ax = plt.subplots()
        im = ax.imshow(w_final, cmap="viridis")
        ax.set_title(f"Final state w — {npz_path.name}")
        fig.colorbar(im, ax=ax, label="state w")
        fig.savefig(w_path, bbox_inches="tight")
        plt.close(fig)
    else:  # pragma: no cover
        import cv2

        u8 = cv2.normalize(w_final, None, 0, 255, cv2.NORM_MINMAX)
        cv2.imwrite(str(w_path), u8.astype(np.uint8))
    out["w_final"] = str(w_path)

    if resistances.ndim != 3 or resistances.shape[0] == 0:
        return out

    series, label = _prepare_series(resistances, meta, value, mode, use_log)
    vmin = float(np.nanmin(series))
    vmax = float(np.nanmax(series))
    if vmax - vmin < 1e-12:
        vmax = vmin + 1e-12

    if key_every and key_every > 0:
        kdir = pathlib.Path(
            key_dir or npz_path.parent / f"{npz_path.stem}_keyframes"
        )
        kdir.mkdir(parents=True, exist_ok=True)
        manifest = {
            "source_npz": str(npz_path),
            "key_every": int(key_every),
            "vmin": vmin,
            "vmax": vmax,
            "fps": float(fps),
            "label": label,
            "frames": [],
        }
        for idx in range(0, series.shape[0], key_every):
            fpath = kdir / f"frame_{idx:05d}.png"
            if HAVE_MPL:
                plt.imsave(fpath, series[idx], cmap="inferno",
                           vmin=vmin, vmax=vmax)
            else:  # pragma: no cover
                import cv2

                cv2.imwrite(str(fpath),
                            _render_frame_u8(series[idx], vmin, vmax))
            manifest["frames"].append(
                {"index": int(idx), "time_s": float(idx / fps),
                 "path": fpath.name}
            )
        with open(kdir / "manifest.json", "w") as fp:
            json.dump(manifest, fp, indent=2)
        out["keyframes"] = str(kdir)

    if save_colorbar:
        cb_path = npz_path.with_suffix(".colorbar.png")
        if HAVE_MPL:
            fig = plt.figure(figsize=(6, 1.0), dpi=200)
            ax = fig.add_axes([0.05, 0.25, 0.9, 0.5])
            norm = matplotlib.colors.Normalize(vmin=vmin, vmax=vmax)
            sm = matplotlib.cm.ScalarMappable(norm=norm, cmap="inferno")
            sm.set_array([])
            cbar = fig.colorbar(sm, cax=ax, orientation="horizontal")
            cbar.set_label(label)
            fig.savefig(cb_path, bbox_inches="tight")
            plt.close(fig)
        else:  # pragma: no cover
            import cv2

            grad = np.tile(np.linspace(0, 1, 600, np.float32), (60, 1))
            cv2.imwrite(str(cb_path), _render_frame_u8(grad, 0, 1))
        out["colorbar"] = str(cb_path)

    if save_mp4:
        import cv2

        vid_path = npz_path.with_suffix(f".{value}_{mode}.mp4")
        h, w = series.shape[1:]
        vw = cv2.VideoWriter(
            str(vid_path), cv2.VideoWriter_fourcc(*"mp4v"),
            min(fps, 60.0), (w, h), isColor=True,
        )
        for frame in series:
            vw.write(_render_frame_u8(frame, vmin, vmax))
        vw.release()
        out["mp4"] = str(vid_path)

    return out


def write_video(frames, out_path, fps: float) -> None:
    """Grayscale MP4 preview writer (eventsim write_video, :86-97): each
    frame is min-max normalised independently."""
    import cv2

    frames = list(frames)
    if not frames:
        return
    h, w = np.asarray(frames[0]).shape
    vw = cv2.VideoWriter(
        str(out_path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h),
        isColor=False,
    )
    for f in frames:
        img = cv2.normalize(
            np.asarray(f), None, 0, 255, cv2.NORM_MINMAX
        ).astype(np.uint8)
        vw.write(img)
    vw.release()
