"""Demo server (nsof_tpu/serve) — the stdlib equivalent of the
reference's Gradio LangSAM app (codebase/lang-segment-anything/app.py).

Runs the whole server lifecycle in a CPU subprocess: start on a free
port, exercise GET / + /api/health + POST /api/segment + POST /api/flow
with the weightless brightness segmenter, assert JSON/PNG contracts.
"""

import numpy as np

from conftest import run_in_cpu_subprocess


def test_draw_overlay_paints_masks_and_boxes():
    from nsof_tpu.serve import draw_overlay

    img = np.zeros((32, 32, 3), np.uint8)
    mask = np.zeros((32, 32), bool)
    mask[8:16, 8:16] = True
    out = draw_overlay(img, [mask], [[8, 8, 15, 15]], ["thing"])
    assert out.shape == img.shape and out.dtype == np.uint8
    assert out[10, 10].sum() > 0          # mask painted
    assert (out != img).any()


def test_server_endpoints_end_to_end():
    run_in_cpu_subprocess(
        """
        import base64, json, threading, urllib.request

        import cv2
        import numpy as np

        from nsof_tpu.data.gt_tooling import BrightnessSegmenter
        from nsof_tpu.serve import make_server

        srv = make_server(segmenter=BrightnessSegmenter())
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()

        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=60
            ) as r:
                return r.status, r.read()

        def post(path, obj):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return r.status, json.loads(r.read())

        def b64png(arr):
            ok, buf = cv2.imencode(".png", arr)
            assert ok
            return base64.b64encode(buf.tobytes()).decode()

        code, page = get("/")
        assert code == 200 and b"nsof_tpu" in page

        code, health = get("/api/health")
        health = json.loads(health)
        assert code == 200 and health["ok"]

        # text-prompted segmentation (weightless backend)
        img = np.zeros((48, 64, 3), np.uint8)
        img[10:30, 20:40] = 255
        code, seg = post(
            "/api/segment",
            {"image": b64png(img), "prompt": "white box"},
        )
        assert code == 200, seg
        assert seg["n_instances"] >= 1
        assert seg["image"].startswith("data:image/png;base64,")
        assert seg["backend"] == "BrightnessSegmenter"
        x0, y0, x1, y1 = seg["boxes"][0]
        assert 15 <= x0 <= 25 and 35 <= x1 <= 45

        # flow pipeline: moving bright box, 64x64 frames
        prev = np.zeros((64, 64), np.uint8); prev[20:36, 10:26] = 230
        nxt = np.zeros((64, 64), np.uint8);  nxt[20:36, 13:29] = 230
        code, fl = post(
            "/api/flow",
            {"prev": b64png(prev), "next": b64png(nxt),
             "preset": "tabletennis"},
        )
        assert code == 200, fl
        for k in ("flow", "mask", "overlay"):
            assert fl[k].startswith("data:image/png;base64,"), k
            raw = base64.b64decode(fl[k].split(",")[1])
            dec = cv2.imdecode(
                np.frombuffer(raw, np.uint8), cv2.IMREAD_UNCHANGED
            )
            assert dec is not None and dec.shape[:2] == (64, 64)
        assert isinstance(fl["box"], list) and len(fl["box"]) == 4
        assert isinstance(fl["region_pct"], float)

        # malformed request -> 400 with an error message, server stays up
        try:
            post("/api/segment", {"image": "not-a-png"})
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
        code, _ = get("/api/health")
        assert code == 200

        srv.shutdown(); srv.server_close()
        print("serve ok")
        """,
        n_devices=1,
        timeout=900,
    )
