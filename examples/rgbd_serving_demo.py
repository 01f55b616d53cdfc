"""RGB-D serving demo: the full node pipeline on synthetic frames.

Exercises the ROS-node-shaped surface end to end without ROS:
ApproximateTime-synchronized RGB + depth frames -> detect -> sort ->
paint-NMS -> 3-D boxes -> plane removal -> clustering -> poses ->
serializable messages (BASELINE config 5's RGB-D variant).

Run: python examples/rgbd_serving_demo.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from partsbaseddetector_tpu import PartsBasedDetector, make_synthetic_model
from partsbaseddetector_tpu.apps.messages import (
    message_bounding_boxes,
    message_image_rgb,
    message_mask,
    message_poses,
)
from partsbaseddetector_tpu.apps.stream import DetectionStream
from partsbaseddetector_tpu.apps.sync import ApproximateTimeSynchronizer
from partsbaseddetector_tpu.depth import StereoCameraModel


def main():
    model = make_synthetic_model(
        nparts=4, nmix=2, fsize=(4, 4), sbin=8, interval=3, thresh=2.0, seed=1
    )
    detector = PartsBasedDetector(model, max_detections=64)
    camera = StereoCameraModel(fx=300, fy=300, cx=120, cy=90)
    stream = DetectionStream(detector, camera, max_overlap=0.1)

    frames = []
    stream.subscribe("candidates", lambda c: None)
    stream.subscribe("poses", lambda p: None)

    def on_pair(rgb, depth):
        result = stream.process(rgb, depth)
        frames.append(result)
        print(
            f"frame {len(frames)}: {len(result.candidates)} candidates, "
            f"{len(result.poses or [])} poses"
        )
        if result.candidates:
            markers = message_bounding_boxes(result.boxes3d or [], "demo")
            img_msg = message_image_rgb(rgb, result.candidates)
            mask_msg = message_mask(rgb.shape[:2], result.candidates)
            pose_msg = (
                message_poses(
                    [p[:3, 3] for p in result.poses], [np.zeros((0, 3))]
                )
                if result.poses
                else None
            )
            print(
                f"  messages: {len(markers)} markers, image "
                f"{img_msg['data'].shape}, mask labels "
                f"{int(mask_msg['data'].max())}"
            )

    sync = ApproximateTimeSynchronizer(["rgb", "depth"], on_pair, slop=0.05)
    rng = np.random.RandomState(0)
    t = 0.0
    for i in range(3):
        rgb = (rng.rand(180, 240, 3) * 255).astype(np.float32)
        depth = np.full((180, 240), 2.0, dtype=np.float32)
        depth += rng.randn(180, 240).astype(np.float32) * 0.01
        # slightly skewed timestamps, as real sensors deliver
        sync.push("rgb", t + 0.01 * rng.rand(), rgb)
        sync.push("depth", t + 0.01 * rng.rand(), depth)
        t += 0.1

    print(f"processed {len(frames)} synchronized frames")


if __name__ == "__main__":
    main()
