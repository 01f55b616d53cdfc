"""Diagnose the realistic-training e2e PCK failure.

Trains (or loads from a persistent cache) the 8-part K=2 grid model of
tests/test_train_realistic_e2e.py, then dissects held-out detection:
per-scene, per-part localization error, chosen mixtures vs the scene's
config, and score margins. Run on CPU (JAX_PLATFORMS=cpu) or TPU.
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import test_train_realistic_e2e as T  # reuse scene/patch generators
from partsbaseddetector_tpu.ops.reference_pipeline import detect_reference
from partsbaseddetector_tpu.train.trainmodel import train_model

CACHE = os.environ.get("PROBE_CACHE", "/tmp/grid8_cache")


def main():
    rng = np.random.RandomState(0)
    positives = []
    for i in range(16):
        im, pts, _ = T._scene(rng, config=i % 2)
        positives.append({"im": im, "points": pts})
    negatives = [
        {"im": T._scene(rng, with_object=False)[0]} for _ in range(4)
    ]
    K = [1] + [2] * (T.P - 1)
    model = train_model(
        "grid8",
        positives,
        negatives,
        K=K,
        pa=T.PA,
        sbin=8,
        interval=2,
        cachedir=CACHE,
        warp_iters=1,
        latent_iters=1,
        nmax=1000,
        c_svm=0.1,
        verbose=True,
    )

    ev = np.random.RandomState(1234)
    for i in range(8):
        im, pts, cfg = T._scene(ev, config=i % 2)
        dets = detect_reference(im, model, thresh=-1e9)
        d = dets[0]
        boxes = np.asarray(d["boxes"], dtype=np.float64)
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        err = np.hypot(cx - pts[:, 0], cy - pts[:, 1])
        mix = d.get("mixtures")
        print(
            f"scene {i} cfg={cfg} score={d['score']:.3f} "
            f"level={d.get('level')}"
        )
        print("   err:", np.round(err, 1))
        print("   mix:", np.asarray(mix))
        # second-best for margin feel
        if len(dets) > 1:
            print(f"   next score={dets[1]['score']:.3f}")

    # what do the filters look like? norms per (part, mixture)
    print("\nfilter norms per (part, mix):")
    for p in range(T.P):
        fids = model.filterid[0][p]
        norms = [float(np.linalg.norm(model.filters[f])) for f in fids]
        print(f"  part {p}: {np.round(norms, 3)}")
    print("\nanchors per (part, mix):")
    for p in range(1, T.P):
        dids = model.defid[0][p]
        anc = [model.anchors[d][:2] for d in dids]
        print(f"  part {p} (pa={T.PA[p]}):", [tuple(a) for a in anc])
    print("\nbiases per part (L x K):")
    for p in range(1, T.P):
        print(f"  part {p}:\n", model.biases[model.biasid[0][p]])


if __name__ == "__main__":
    main()
