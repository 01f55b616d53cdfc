"""Training demo (the reference's training_demo.m, Python edition).

Trains a small articulated model end to end on synthetic scenes with a
planted three-part pattern, then evaluates PCK on held-out images —
exercising the complete training stack: point_to_box annotation
processing, part-type clustering, warped per-part SVMs, tree assembly,
latent SSVM retraining, and the evaluation harness.

Run: python examples/training_demo.py [--fast]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from partsbaseddetector_tpu.cpu_detector import CPUPartsBasedDetector
from partsbaseddetector_tpu.eval.metrics import boxes_to_keypoints, eval_pck
from partsbaseddetector_tpu.train.trainmodel import train_model


def make_scene(rng, with_object=True, size=96):
    im = rng.rand(size, size, 3) * 40
    points = None
    if with_object:
        cx = rng.randint(28, size - 44)
        cy = rng.randint(28, size - 44)
        im[cy - 8 : cy + 8, cx - 8 : cx + 8, 0] += 200
        im[cy + 10 : cy + 26, cx - 8 : cx + 8, 1] += 200
        im[cy + 28 : cy + 44, cx - 8 : cx + 8, 2] += 200
        points = np.array([[cx, cy], [cx, cy + 18], [cx, cy + 36]], dtype=float)
    return np.clip(im, 0, 255), points


def main():
    fast = "--fast" in sys.argv
    rng = np.random.RandomState(0)
    pa = [0, 0, 1]  # K mixtures per part, parent indices
    n_train = 8 if fast else 16

    positives, negatives = [], []
    for _ in range(n_train):
        im, pts = make_scene(rng)
        positives.append({"im": im, "points": pts})
    for _ in range(4):
        negatives.append({"im": make_scene(rng, False)[0]})

    model = train_model(
        "demo3", positives, negatives, K=[1, 1, 1], pa=pa,
        sbin=8, interval=2, warp_iters=1, latent_iters=1, nmax=400,
        verbose=True,
    )

    # held-out evaluation
    det = CPUPartsBasedDetector(model)
    preds, gts = [], []
    for seed in range(100, 106):
        im, pts = make_scene(np.random.RandomState(seed))
        cands = det.detect(im)
        if cands:
            preds.append(boxes_to_keypoints(cands[0].parts))
            gts.append(pts)
    pck = eval_pck(np.stack(preds), np.stack(gts), thresh=0.5)
    print(f"held-out PCK@0.5 per part: {pck}")


if __name__ == "__main__":
    main()
