"""Host-side data layer for the bundled reference scenes."""

from nsof_tpu.data.scenes import SceneData, load_scene  # noqa: F401
