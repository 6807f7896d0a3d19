"""Application layer: scenes → run loop → rendering/export/checkpoints.

The TPU-native replacement for the reference's interactive OpenGL viewer
(``main.cpp``): no GL stack exists on TPU hosts, so rendering is an offline
point-sprite rasteriser writing PNG frames or piping raw video to ffmpeg
(the reference's recording path, ``main.cpp:40-62``), driven by a CLI.
"""

from .render import Camera, render_frame
from .export import FrameExporter, VideoWriter

__all__ = ["Camera", "render_frame", "FrameExporter", "VideoWriter"]
