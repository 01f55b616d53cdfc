"""Dissect the realistic-training collapse: stage-by-stage filter norms
and per-scene latent mining behavior on the cached pipeline stages."""

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import test_train_realistic_e2e as T
from partsbaseddetector_tpu.train.data import crop_positive, point_to_box

CACHE = os.environ.get(
    "PROBE_CACHE",
    "/tmp/pytest-of-root/pytest-15/test_train_realistic_model_end0/cache",
)


def load(key):
    with open(os.path.join(CACHE, f"grid8_{key}.pkl"), "rb") as fh:
        return pickle.load(fh)


def norms(model, tag):
    print(f"-- {tag}: filter norms per (part, mix)")
    for p in range(T.P):
        fids = model.filterid[0][p]
        ns = [float(np.linalg.norm(model.filters[f])) for f in fids]
        print(f"   part {p}: {np.round(ns, 3)}")


def main():
    joint = load("joint")
    fixed_m = load("latent_fixed")
    final = load("final")
    norms(joint, "joint (post-warp)")
    norms(fixed_m, "latent_fixed")
    norms(final, "final")

    idx = load("clusters")
    print("cluster labels per part (rows=parts, cols=scenes):")
    print(np.stack([idx[p] for p in range(T.P)]))

    # rebuild the training positives exactly as train_model does
    rng = np.random.RandomState(0)
    positives = []
    for i in range(16):
        im, pts, _ = T._scene(rng, config=i % 2)
        positives.append({"im": im, "points": pts})
    positives = point_to_box(positives, T.PA)
    positives = [crop_positive(ex) for ex in positives]

    model = joint
    minsize = float(
        np.prod(np.asarray(model.effective_maxsize()) * model.sbin)
    )
    print("effective_maxsize:", model.effective_maxsize(), "sbin:", model.sbin,
          "minsize(px^2):", minsize)
    b = np.asarray(positives[0]["boxes"])
    areas = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    print("scene0 part-box areas:", areas)
    print("any area < minsize:", bool(np.any(areas < minsize)))

    # run the fixed-mixture latent mining with the joint model on a few
    # scenes, with both miners
    from partsbaseddetector_tpu.ops.reference_pipeline import detect_reference
    from partsbaseddetector_tpu.train.detect_tpu import TPUMiner

    fixed = np.stack([idx[p] for p in range(T.P)], axis=1)
    miner = TPUMiner(model, max_det=64)
    interval0 = model.interval
    for i in (0, 1, 2, 3):
        ex = positives[i]
        im = np.asarray(ex["im"], dtype=np.float64)
        kw = dict(
            thresh=-1e8,
            part_boxes=np.asarray(ex["boxes"]),
            overlap=0.6,
            fixed_mixtures=fixed[i],
        )
        d_t = miner.detect(im, **kw)
        d_r = detect_reference(im, model, **kw)
        print(f"scene {i} (config {i % 2}) fixed={fixed[i]}")
        for tag, dets in (("tpu", d_t), ("ref", d_r)):
            if not dets:
                print(f"   {tag}: NO DETS")
                continue
            d = dets[0]
            bx = np.asarray(d["boxes"], dtype=np.float64)
            cx = (bx[:, 0] + bx[:, 2]) / 2
            cy = (bx[:, 1] + bx[:, 3]) / 2
            pts = np.asarray(ex["points"])
            err = np.hypot(cx - pts[:, 0], cy - pts[:, 1])
            print(
                f"   {tag}: score={d['score']:.3f} mix={np.asarray(d['mixtures'])}"
                f" err={np.round(err, 1)}"
            )


if __name__ == "__main__":
    main()
