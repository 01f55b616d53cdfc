"""Realistic-scale training proof: an 8-part, 2-mixture model trained
end-to-end by the full driver, PCK-evaluated on held-out scenes,
round-tripped through every model format, and consumed by the compiled
reference C++ binary.

This is the trainmodel.m:19-64 pipeline at the structure of a real
parts model (mixtures from geometric clustering, pairwise bias tables,
latent retraining with the TPU miner), with the artifact-portability
legs VERDICT round 2 asked for: .npz -> .mat -> .xml fidelity and
reference-binary consumption. The reference consumption leg uses the
raw-model oracle path (tests/refcpp.detect_raw): no XML can carry a
multi-mixture model into the reference binary — its reader replaces
non-scalar defid lists with [0] (src/FileStorageModel.cpp:148-152) and
even a *scalar* defid K>=2 model sends its DP out of bounds
(include/Parts.hpp:179-183 indexes the length-1 defid vector per
mixture; pinned behaviorally in test_reference_e2e.py).
"""

import copy
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import refcpp  # noqa: E402

from partsbaseddetector_tpu import PartsBasedDetector
from partsbaseddetector_tpu.eval.metrics import boxes_to_keypoints, eval_pck
from partsbaseddetector_tpu.models.filestorage import FileStorageModel
from partsbaseddetector_tpu.models.matlabio import MatlabIOModel
from partsbaseddetector_tpu.models.model import load_model, save_model
from partsbaseddetector_tpu.ops.reference_pipeline import detect_reference
from partsbaseddetector_tpu.train.trainmodel import train_model

# two chains off a 3x3-ish grid; parents always precede children
PA = [0, 0, 1, 0, 3, 4, 3, 6]
P = len(PA)

# per-part offsets from the object origin, config A; config B swaps
# x/y (a 90-degree relayout), so every limb's relative offset differs
# between configs and K=2 geometric clustering separates them. 24 px
# spacing makes the part boxes 3x3 HOG cells, so the latent stage's
# IoU-0.6 overlap constraint is reachable on the 8 px response grid
# (2x2-cell 16 px boxes top out below 0.6 at worst-case grid phase).
_OFFSETS_A = np.array(
    [
        [0, 0],
        [24, 0],
        [48, 0],
        [0, 24],
        [24, 24],
        [48, 24],
        [0, 48],
        [24, 48],
    ],
    dtype=np.float64,
)


def _patch(p, config):
    """A 20x20 stripe texture unique to (part, config). HOG is
    color-blind (gradient orientation histograms only), so parts MUST
    differ in gradient structure or the grid of parts matches itself
    shifted — the DP has translation-symmetric optima and localization
    is ill-posed no matter how well the SVMs train (probed in round 3).
    Every (part, config) pair gets its own stripe orientation
    (2p + 9*config) * 11.25 deg — 16 angles, all distinct mod 180.
    WITHIN a scene (one config) parts are 22.5 deg apart; a part's two
    configs are 78.75 deg apart, so latent mixture assignment is
    strongly appearance-separable. (Two failed variants probed in
    round 3: stripes-vs-checker at shared angles, and
    (2p + config) * 11.25 where a part's configs differ by a sub-bin
    11.25 deg — both starved one mixture per part of latent positives,
    collapsed its filter to ~zero, and the surviving mixture's
    wrong-config anchor dragged held-out PCK to ~0.5.)
    Period 6 px keeps gradients visible to the [-1, 0, 1] centered
    difference (period 2 is invisible to it)."""
    th = np.deg2rad((2 * p + 9 * config) * 11.25)
    yy, xx = np.mgrid[0:20, 0:20]
    u = xx * np.cos(th) + yy * np.sin(th)
    return 130.0 + 110.0 * np.sign(np.sin(2 * np.pi * u / 6.0))


_PATCHES = {(p, c): _patch(p, c) for p in range(8) for c in (0, 1)}


def _scene(rng, config=None, size=160, with_object=True):
    """A noise scene with an 8-part textured-grid object planted at a
    random position. config 0/1 picks the geometric layout (x/y
    swapped) AND the per-part stripe angles, so appearance mixtures
    align with the geometric clusters (see _OFFSETS_A for why the
    24 px spacing matters)."""
    im = rng.rand(size, size, 3) * 40
    if not with_object:
        return np.clip(im, 0, 255), None, None
    if config is None:
        config = rng.randint(2)
    offs = _OFFSETS_A if config == 0 else _OFFSETS_A[:, ::-1]
    ext = offs.max(0)

    def _origin(e):
        lo, hi = 16, size - int(e) - 28
        if hi <= lo:  # small scenes: just keep every patch in frame
            lo, hi = 10, size - int(e) - 9
        return rng.randint(lo, hi)

    ox = _origin(ext[0])
    oy = _origin(ext[1])
    pts = offs + [ox, oy]
    for p in range(P):
        cx, cy = int(pts[p, 0]), int(pts[p, 1])
        im[cy - 10 : cy + 10, cx - 10 : cx + 10, :] = _PATCHES[
            (p, config)
        ][..., None]
    return np.clip(im, 0, 255), pts, config


@pytest.mark.slow
def test_train_realistic_model_end_to_end(tmp_path):
    rng = np.random.RandomState(0)
    positives = []
    for i in range(16):
        im, pts, _ = _scene(rng, config=i % 2)
        positives.append({"im": im, "points": pts})
    negatives = [
        {"im": _scene(rng, with_object=False)[0]} for _ in range(4)
    ]

    # root K=1 (sidesteps the reference's root-bias broadcast quirk,
    # src/DynamicProgram.cpp:162-171, for the consumption leg); every
    # other part gets 2 geometric/appearance mixtures
    K = [1] + [2] * (P - 1)
    model = train_model(
        "grid8",
        positives,
        negatives,
        K=K,
        pa=PA,
        sbin=8,
        interval=2,
        cachedir=str(tmp_path / "cache"),
        warp_iters=1,
        latent_iters=1,
        nmax=1000,
        # C=0.002 is train.m's value for thousands of real examples; on
        # 16 synthetic scenes the regularized optimum at that C is the
        # zero filter (all positives score -0.78; probed in round 3).
        # 0.1 keeps every (part, mixture) filter's norm healthy through
        # the latent rounds (0.02 still collapsed two of them to zero)
        c_svm=0.1,
    )
    model.validate()
    assert model.nparts(0) == P
    assert all(
        len(model.filterid[0][p]) == K[p] for p in range(P)
    ), "every part must keep its clustered mixture count"

    # --- PCK on held-out scenes (eval_pck.m semantics) -----------------
    ev = np.random.RandomState(1234)
    preds, gts = [], []
    for i in range(8):
        im, pts, _ = _scene(ev, config=i % 2)
        dets = detect_reference(im, model, thresh=-1e9)
        assert dets, "trained model must fire on a held-out object scene"
        preds.append(boxes_to_keypoints(dets[0]["boxes"]))
        gts.append(pts)
    pck = eval_pck(np.stack(preds), np.stack(gts), thresh=0.25)
    assert pck.mean() >= 0.7, f"held-out PCK too low: {pck}"

    # --- artifact round-trips: .npz -> .mat -> .xml ---------------------
    probe_rng = np.random.RandomState(777)
    probe, _, _ = _scene(probe_rng, config=0)
    base_dets = detect_reference(probe, model, thresh=-1e9)[:5]
    assert base_dets

    npz = str(tmp_path / "grid8.npz")
    save_model(model, npz)
    m_npz = load_model(npz)
    mat = str(tmp_path / "grid8.mat")
    MatlabIOModel.write(m_npz, mat)
    m_mat = MatlabIOModel.read(mat)
    xml = str(tmp_path / "grid8.xml")
    FileStorageModel.write(m_mat, xml)
    m_xml = FileStorageModel.read(xml)

    for m in (m_npz, m_mat, m_xml):
        m.validate()
        dets = detect_reference(probe, m, thresh=-1e9)[:5]
        assert len(dets) == len(base_dets)
        for d, b in zip(dets, base_dets):
            assert abs(d["score"] - b["score"]) < 1e-4, (
                d["score"],
                b["score"],
            )
            np.testing.assert_allclose(
                d["boxes"], b["boxes"], atol=1e-3
            )

    # --- the TPU serving detector consumes the trained artifact --------
    det = PartsBasedDetector(m_xml, max_detections=64)
    cands = det.detect(probe.astype(np.float32))
    assert cands, "serving detector must fire on the trained model"
    assert abs(cands[0].score - base_dets[0]["score"]) < 2e-3

    # --- reference-binary consumption (raw-model oracle path) ----------
    if not refcpp.available():
        pytest.skip("reference C++ oracle unavailable")
    # single-scale comparison (interval=1, min side < 80 => one pyramid
    # level, src/HOGFeatures.cpp:99): resize-free, so the only deltas
    # are f32 rounding. Part boxes may legitimately differ (the C++
    # DT's argmin composition defect, see test_reference_e2e.py), so
    # the assertion pins count/score/component/root box.
    m_cpp = copy.deepcopy(model)
    m_cpp.interval = 1
    m_cpp.thresh = -2.0
    probe_small = np.zeros((72, 96, 3))
    sc_rng = np.random.RandomState(55)
    scene_small, _, _ = _scene(sc_rng, config=0, size=72)
    probe_small[:, :72] = scene_small
    probe_small[:, 72:] = sc_rng.rand(72, 24, 3) * 40
    probe_u8 = probe_small.astype(np.uint8)
    want = refcpp.detect_raw(
        m_cpp, np.ascontiguousarray(probe_u8[..., ::-1])
    )
    got = PartsBasedDetector(
        m_cpp, max_detections=256, border_mode="cpp"
    ).detect(probe_u8)
    assert len(want) > 0, "oracle must fire on the planted object"
    assert len(got) == len(want)
    for g, (comp, score, boxes) in zip(got, want):
        assert g.component == comp
        assert abs(float(g.score) - score) < 1e-4, (g.score, score)
        p0 = np.asarray(g.parts, dtype=np.float64)[0]
        np.testing.assert_array_equal(
            np.array(
                [p0[0], p0[1], p0[2] - p0[0], p0[3] - p0[1]], dtype=np.int64
            ),
            boxes[0],
        )
