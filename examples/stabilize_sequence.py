"""Sequence stabilization: recover per-image view directions with SIFT.

The reference's second headline workflow (optimize.py call stack:
KeypointMatcher.build_keypoints/build_matches -> ObserverCameras.fit):
a time-lapse camera wobbles between frames; keypoint matches between image
pairs + anchor images pin down every frame's view direction.

Here the wobble is synthesized from the bundled real photograph: each frame
is the anchor image reprojected through a camera rotated by a known jitter,
so the recovered view directions have ground truth to compare against.

Run: python examples/stabilize_sequence.py  (CPU, ~1 min; needs cv2/SIFT)
"""
import datetime
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import PIL.Image

from glimpse_tpu import Image, optimize

PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "assets", "AK10b_20141013_020336.JPG",
)


def main() -> None:
    true_jitter = [(0.0, 0.0, 0.0), (0.4, -0.3, 0.2), (-0.5, 0.2, -0.3)]
    cam_kwargs = {"imgsz": (400, 268), "fmm": 20, "sensorsz": (23.6, 15.8)}
    anchor = Image(PATH, cam=cam_kwargs)

    t0 = datetime.datetime(2020, 1, 1)
    day = datetime.timedelta(days=1)
    tmpdir = tempfile.mkdtemp(prefix="stabilize_")
    images = []
    for i, jitter in enumerate(true_jitter):
        cam = anchor.cam.copy()
        cam.viewdir = jitter
        frame = np.nan_to_num(anchor.project(cam)).astype(np.uint8)
        path = os.path.join(tmpdir, f"frame_{i}.jpg")
        PIL.Image.fromarray(frame).save(path, quality=95)
        img = Image(path, cam=cam_kwargs, datetime=t0 + i * day)
        img.cam.viewdir = (0.0, 0.0, 0.0)  # wrong guess: unstabilized
        images.append(img)

    class SequenceObserver:
        def __init__(self, images):
            self.images = images

    model = optimize.ObserverCameras(SequenceObserver(images), anchors=[0])
    model.build_keypoints(contrastThreshold=0.02)
    model.build_matches(maxdt=datetime.timedelta(days=5))
    result = model.fit()
    fitted = result.x.reshape(-1, 3)

    print(f"stabilization: {len(images)} frames, "
          f"{sum(m.size for m in model.matches.data)} matched keypoint pairs")
    for i, (truth, got) in enumerate(zip(true_jitter, fitted)):
        err = np.abs(np.asarray(got) - np.asarray(truth))
        print(f"  frame {i}: true viewdir {truth} -> recovered "
              f"({got[0]:+.3f}, {got[1]:+.3f}, {got[2]:+.3f}), "
              f"max error {err.max():.4f} deg")
    assert np.abs(fitted - np.asarray(true_jitter)).max() < 0.05, "stabilization off"
    print("stabilization: all frames recovered within 0.05 deg")


if __name__ == "__main__":
    main()
