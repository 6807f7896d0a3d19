"""Offline interactive runtime control: a polled JSON command file.

The reference is an *interactive* app — pause key
(``main.cpp:334-345``), WASD+mouse camera (``main.cpp:353-472``) and
keypress particle dropping (``main.cpp:499-521``) act on the running
simulation. Headless TPU runs have no event loop, so the equivalent here
is a **control file** next to the outputs (``<out>_control.json``) that
the CLI polls every step (one ``stat()``; re-read only on mtime change):

    {"seq": 1, "pause": true}                        # freeze the run
    {"seq": 2, "pause": true,
     "camera": {"azimuth": 120, "elevation": 25,
                "distance": 2.5}}                    # orbit while paused
                                                     # (latest.png re-renders)
    {"seq": 3, "pause": false, "drop": true}         # resume + drop a cube
    {"seq": 4, "drop": [0.3, 0.6, 0.3, 0.1]}         # drop at cx,cy,cz,side
    {"seq": 5, "stop": true}                         # end the run cleanly

Protocol: ``pause`` is LEVEL state — it holds while the file says so and
releases when overwritten with ``pause: false`` (or the key removed).
Every other command is one-shot, applied once per *increase* of ``seq``
(so atomic rewrites of the whole file never double-apply a drop).
Writers should replace the file atomically (write temp + rename); a
half-written file is simply skipped until the next poll.
"""

from __future__ import annotations

import json
import math
import os
import time


class ControlChannel:
    """Poll ``path`` for commands; see the module docstring for the
    protocol. ``poll()`` is cheap enough to call every step."""

    def __init__(self, path: str, logger=None, poll_sleep: float = 0.2):
        self.path = path
        self.log = logger
        self.sleep = poll_sleep
        self.paused = False
        self._seq = None
        self._mtime = None

    def _read(self):
        try:
            st = os.stat(self.path)
        except OSError:
            return None
        if st.st_mtime_ns == self._mtime:
            return None
        self._mtime = st.st_mtime_ns
        try:
            with open(self.path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            return None   # mid-write; the next poll gets the full file
        return doc if isinstance(doc, dict) else None

    def poll(self) -> dict:
        """Returns the newly-applied one-shot commands ({} if none) and
        refreshes the ``paused`` level state."""
        doc = self._read()
        if doc is None:
            return {}
        self.paused = bool(doc.get("pause", False))
        seq = doc.get("seq")
        if seq is None or (self._seq is not None and seq <= self._seq):
            return {}
        self._seq = seq
        return {k: v for k, v in doc.items() if k not in ("seq", "pause")}

    def pump(self, on_cmds) -> bool:
        """One per-step pump: apply any new commands, and while the file
        says ``pause`` keep polling (so camera / drop / stop keep working
        on the frozen sim — the pause→inspect→drop→resume session).
        Returns True when a ``stop`` command ends the run."""
        cmds = self.poll()
        if cmds:
            on_cmds(cmds)
        stopped = bool(cmds.get("stop"))
        announced = False
        while self.paused and not stopped:
            if not announced and self.log is not None:
                self.log.info("paused by %s (write pause: false to "
                              "resume)", self.path)
                announced = True
            time.sleep(self.sleep)
            cmds = self.poll()
            if cmds:
                on_cmds(cmds)
            stopped = bool(cmds.get("stop"))
        if announced and not stopped and self.log is not None:
            self.log.info("resumed")
        return stopped


def orbit_camera(spec: dict, default_target=(0.25, 0.3, 0.25)):
    """Build a renderer Camera from an orbit spec
    ``{azimuth°, elevation°, distance, target?}`` around the target —
    the offline analogue of the reference's mouse orbit."""
    from .render import Camera
    az = math.radians(float(spec.get("azimuth", 45.0)))
    el = math.radians(float(spec.get("elevation", 20.0)))
    dist = float(spec.get("distance", 3.0))
    target = tuple(spec.get("target", default_target))
    eye = (target[0] + dist * math.cos(el) * math.sin(az),
           target[1] + dist * math.sin(el),
           target[2] + dist * math.cos(el) * math.cos(az))
    return Camera(eye=eye, target=target)
