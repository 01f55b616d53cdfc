"""Instrument the warp-stage hard-negative mining: after the positive
pass, run the miner on one noise negative and dump each mined
placement's grid position and occlusion-channel mass in its phi."""

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import test_train_realistic_e2e as T
from partsbaseddetector_tpu.ops.reference_pipeline import (
    detect_reference,
    feature_pyramid,
)
from partsbaseddetector_tpu.train.data import point_to_box, crop_positive
from partsbaseddetector_tpu.train.builder import init_part_model
from partsbaseddetector_tpu.train.latent import train, warped_positive_phi
from partsbaseddetector_tpu.train.layout import ParamLayout
from partsbaseddetector_tpu.train.features import (
    Placement,
    placement_feature,
)


def main():
    part, mix = 1, 0
    rng = np.random.RandomState(0)
    positives = []
    for i in range(16):
        im, pts, _ = T._scene(rng, config=i % 2)
        positives.append({"im": im, "points": pts})
    positives = point_to_box(positives, T.PA)
    positives = [crop_positive(ex) for ex in positives]
    sel = [i for i in range(16) if i % 2 == mix]
    spos = []
    for n in sel:
        ex = dict(positives[n])
        ex["boxes"] = ex["boxes"][part : part + 1]
        spos.append(ex)

    m = init_part_model(
        [
            (b[3] - b[1] + 1, b[2] - b[0] + 1)
            for ex in spos
            for b in [ex["boxes"][0]]
        ],
        sbin=8,
        interval=2,
        name="probe",
    )
    print("model.pad():", m.pad(), "filter shape:", m.filters[0].shape)

    nrng = np.random.RandomState(42)
    neg_im = T._scene(nrng, with_object=False)[0]

    # train positives-only first (one opt on warped positives)
    m1 = train(m, spos, [], warp=True, iters=1, nmax=1000,
               c_svm=0.1, wpos=2.0, verbose=True)
    layout = ParamLayout.build(m1)
    w = layout.model_to_vec(m1)

    interval0 = m1.interval
    m1.interval = min(2, interval0)
    dets = detect_reference(neg_im, m1, thresh=-1.0)
    feats, _, _, _ = feature_pyramid(neg_im, m1)
    print(f"mined {len(dets)} negs; top 20:")
    for d in dets[:20]:
        pl = Placement(
            level=d["level"], component=d["component"],
            xs=d["xs"], ys=d["ys"], mixtures=d["mixtures"],
        )
        phi = placement_feature(m1, layout, feats, pl)
        # occlusion-channel mass: sum of phi entries at occ positions
        fidx = int(m1.filterid[0][0][0])
        fh, fw, fc = m1.filters[fidx].shape
        off = layout.filter_off[fidx]
        block = phi[off : off + fh * fw * fc].reshape(fh, fw, fc)
        occ = float(block[..., -1].sum())
        print(
            f"  lvl={d['level']} x={int(d['xs'][0])} y={int(d['ys'][0])} "
            f"score={d['score']:.3f} occ_mass={occ:.1f} "
            f"recon={float(w @ phi):.3f}"
        )
    fshape = feats[0].shape
    print("level0 padded feat shape:", fshape,
          "=> x range [0,", fshape[1] - fw, "] y range [0,", fshape[0] - fh, "]")


if __name__ == "__main__":
    main()
