"""Frame and video export.

Mirrors the reference's recording path — raw RGB frames piped to an ffmpeg
process (``main.cpp:40-62``, gated by ``RECORD_SIMULATION`` and writing
every 10th frame, ``main.cpp:618-624``) — plus offline options the
reference lacks: PNG frames (PIL) and raw ``.npz`` particle dumps for
post-hoc analysis/rendering.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np


class VideoWriter:
    """Pipe RGB24 frames to ffmpeg (the reference's exact recording scheme).

    Raises at construction if ffmpeg is not on PATH.
    """

    def __init__(self, path: str, width: int, height: int, fps: int = 60):
        if shutil.which("ffmpeg") is None:
            raise RuntimeError(
                "ffmpeg not found on PATH; use FrameExporter(kind='png') "
                "or kind='npz' instead")
        self.width, self.height = width, height
        self._proc = subprocess.Popen(
            ["ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
             "-s", f"{width}x{height}", "-r", str(fps), "-i", "-",
             "-an", "-pix_fmt", "yuv420p", "-c:v", "libx264", path],
            stdin=subprocess.PIPE,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    def write(self, frame: np.ndarray):
        assert frame.shape == (self.height, self.width, 3)
        self._proc.stdin.write(np.ascontiguousarray(frame).tobytes())

    def close(self):
        if self._proc.stdin:
            self._proc.stdin.close()
        self._proc.wait()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FrameExporter:
    """Write simulation frames to a directory.

    kind='png'  — rendered images (requires the renderer + PIL)
    kind='npz'  — raw particle state (pos/vel/pressure), render later
    kind='mp4'  — ffmpeg video (single file at ``outdir/sim.mp4``)

    ``watch=True`` additionally keeps ``outdir/latest.png`` pointing at the
    newest rendered frame (atomic replace) — the offline analogue of the
    reference's live GL window (``main.cpp:582-634``): tail it with any
    image viewer while the run progresses.
    """

    def __init__(self, outdir: str, kind: str = "png", *, width=1024,
                 height=768, fps=60, render_kwargs=None, watch=False):
        self.outdir = outdir
        self.kind = kind
        self.watch = watch
        self.width, self.height = width, height
        self.render_kwargs = render_kwargs or {}
        self._frame = 0
        self._video = None
        os.makedirs(outdir, exist_ok=True)
        if kind == "mp4":
            self._video = VideoWriter(os.path.join(outdir, "sim.mp4"),
                                      width, height, fps)
        elif kind not in ("png", "npz"):
            raise ValueError(f"unknown export kind {kind!r}")

    def add(self, pos, vel=None, pressure=None):
        pos = np.asarray(pos)
        vel = None if vel is None else np.asarray(vel)
        if self.kind == "npz":
            np.savez_compressed(
                os.path.join(self.outdir, f"frame_{self._frame:06d}.npz"),
                pos=pos, **({"vel": vel} if vel is not None else {}),
                **({"pressure": np.asarray(pressure)}
                   if pressure is not None else {}))
        else:
            from .render import render_frame
            frame = render_frame(pos, vel, width=self.width,
                                 height=self.height, **self.render_kwargs)
            if self.kind == "png":
                from PIL import Image
                Image.fromarray(frame).save(
                    os.path.join(self.outdir, f"frame_{self._frame:06d}.png"))
            else:
                self._video.write(frame)
            if self.watch:
                from PIL import Image
                tmp = os.path.join(self.outdir, ".latest.tmp.png")
                Image.fromarray(frame).save(tmp)
                os.replace(tmp, os.path.join(self.outdir, "latest.png"))
        self._frame += 1

    def close(self):
        if self._video is not None:
            self._video.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
