"""KITTI odometry dataset runner (the benchmarkable path).

Host re-design of KittiRunner (reference: src/kittirunner.cpp): load
``times.txt`` plus 6-digit PNGs from ``image_0/`` / ``image_1/``
(reference: loadImages :42-77), feed each stereo pair to the SLAM engine
with optional real-time pacing (reference: ProcessImage :99-173, pacing
:163-170), and report median/mean tracking time at shutdown (reference:
ShutDown :83-97).

The decode+transfer pipeline prefetches the next pair on a worker thread so
PNG decoding overlaps device compute (SURVEY.md section 7 hard-part 7);
the C++ decoder in native/ is used when built, else PIL.
"""

from __future__ import annotations

import os
import statistics
import threading
import time
from queue import Queue

import numpy as np


def load_times(kitti_path: str) -> list[float]:
    with open(os.path.join(kitti_path, "times.txt")) as f:
        return [float(line) for line in f if line.strip()]


def image_paths(kitti_path: str, index: int) -> tuple[str, str]:
    name = f"{index:06d}.png"
    return (
        os.path.join(kitti_path, "image_0", name),
        os.path.join(kitti_path, "image_1", name),
    )


def decode_png_gray(path: str) -> np.ndarray:
    """Grayscale float32 [H, W]; native decoder if available, else PIL."""
    try:
        from ..native import png_native

        arr = png_native.decode_gray(path)
        if arr is not None:
            return arr
    except Exception:
        pass
    from PIL import Image

    img = Image.open(path).convert("L")
    return np.asarray(img, dtype=np.float32)


class KittiRunner:
    """Drives a SLAM target over a KITTI sequence directory.

    ``slam`` is either a :class:`..models.selflocalization.Selflocalization`
    pipeline (preferred: its ``track`` publishes pose+map per frame and
    collects the fps.txt series itself, matching the reference's
    runKitti -> Track -> sendPose/sendMap flow,
    reference: src/selflocalization.cpp:65-99) or a bare engine exposing
    ``process`` (tests/bench), in which case this runner publishes."""

    def __init__(self, kitti_path: str, slam, real_time: bool = False,
                 publisher=None, prefetch: int = 4):
        self.kitti_path = kitti_path
        self.slam = slam
        self.real_time = real_time
        self.publisher = publisher
        self.times = load_times(kitti_path)
        self.track_times: list[float] = []
        self._queue: Queue = Queue(maxsize=prefetch)
        self._n = len(self.times)

    @property
    def _trajectory(self):
        inner = getattr(self.slam, "slam", None)
        return (inner or self.slam).trajectory

    def _producer(self):
        for i in range(self._n):
            left_path, right_path = image_paths(self.kitti_path, i)
            self._queue.put(
                (i, decode_png_gray(left_path), decode_png_gray(right_path))
            )
        self._queue.put(None)

    def run(self, max_frames: int | None = None):
        """Process the sequence; returns the trajectory list."""
        t = threading.Thread(target=self._producer, daemon=True)
        t.start()
        processed = 0
        while True:
            item = self._queue.get()
            if item is None:
                break
            i, left, right = item
            t0 = time.time()
            if hasattr(self.slam, "track"):
                # Selflocalization pipeline: publishes + records fps series
                self.slam.track(left, right, timestamp=self.times[i])
            else:
                self.slam.process(left, right, timestamp=self.times[i])
                if self.publisher is not None:
                    self._publish(i)
            dt = time.time() - t0
            self.track_times.append(dt)
            processed += 1

            if self.real_time and i + 1 < self._n:
                budget = self.times[i + 1] - self.times[i]
                if dt < budget:  # real-time pacing (reference :163-170)
                    time.sleep(budget - dt)
            if max_frames is not None and processed >= max_frames:
                break
        return self._trajectory

    def _publish(self, frame_idx: int):
        """Engine-mode publishing: a REAL pose per frame (sendPose contract,
        reference: src/selflocalization.cpp:83-86, 301-328) and the full map
        every 20 frames."""
        from ..models.selflocalization import pose_to_geolocation
        from .messages import chunk_map_messages

        traj = self._trajectory
        if not traj:
            return
        T = np.asarray(traj[-1])
        self.publisher.send(pose_to_geolocation(T, 0.0, 0.0, 0.0))
        # full map every 20 frames, pose-only otherwise (cadence contract,
        # reference: src/selflocalization.cpp:88-99)
        if frame_idx % 20 == 0 and hasattr(self.slam, "map"):
            m = self.slam.map
            pts = np.asarray(m.pt_pos)[np.asarray(m.pt_valid)]
            for msg in chunk_map_messages(T, pts.tolist()):
                self.publisher.send(msg)

    def shutdown_stats(self) -> dict:
        """Median/mean tracking time (reference: src/kittirunner.cpp:88-96)."""
        if not self.track_times:
            return {"median_s": 0.0, "mean_s": 0.0, "fps": 0.0}
        med = statistics.median(self.track_times)
        mean = sum(self.track_times) / len(self.track_times)
        return {
            "median_s": med,
            "mean_s": mean,
            "fps": 1.0 / mean if mean > 0 else 0.0,
        }
