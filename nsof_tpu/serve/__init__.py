"""Interactive demo server (stdlib equivalent of the reference's Gradio
LangSAM app, codebase/lang-segment-anything/app.py)."""

from nsof_tpu.serve.app import (  # noqa: F401
    DemoService,
    draw_overlay,
    make_server,
    serve,
)
from nsof_tpu.serve.engine import BatchingEngine, EngineStats  # noqa: F401
