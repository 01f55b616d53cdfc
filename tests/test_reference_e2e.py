"""Full-pipeline golden parity vs the reference's ACTUAL C++ detect().

tests/refcpp compiles the reference's inference library in place
(src/{filter,HOGFeatures,DynamicProgram,PartsBasedDetector,
FileStorageModel}.cpp against OpenCV 4.6) and runs its real
PartsBasedDetector<float>::detect() on models written by this repo's
FileStorageModel writer. These tests close the last credibility gap
from the kernel-level MEX goldens (test_reference_golden.py): the
*composed* pipeline — model XML round-trip through the C++ reader,
HOG, same-size conv with the one-padded occlusion channel, DT message
passing, thresholding, backtracking, box emission — is compared
end-to-end against the reference binary's candidate sets.

Semantics pinned here (and their reference anchors):
  - channel order: the C++ demo consumes BGR images (imread,
    src/demo.cpp:95); our API consumes RGB. HOGFeatures picks the
    strongest-gradient color channel scanning interleaved channels
    back-to-front (src/HOGFeatures.cpp:217-240) while features.cc
    scans planes front-to-back — identical selection (ties included)
    when each side is fed its native channel order, so the oracle gets
    image[..., ::-1].
  - grid/displacement: C++ emits box = (idx - 1) * scale
    (src/DynamicProgram.cpp:238-240) and penalizes child displacement
    d = parent_idx + anchor - child_idx (DistanceTransform.hpp:172-178)
    with NO off-by-one vs our cpp border mode.
  - argmax ties: the C++ envelope scan (DistanceTransform.hpp:152-182)
    breaks exact score ties differently from the MATLAB MEX scan our
    kernels pin to (matlab/mex/shiftdt.cc:17-51), so equal-scoring part
    placements may differ; scores, counts, components and root argmaxes
    must still agree exactly. Tie-free fixtures assert full box
    identity.

Known reference defects verified while building the oracle (not
replicated): single-part models crash the C++ DP (empty ncscores at
the root-bias step, src/DynamicProgram.cpp:162-171); the root bias
is broadcast from bias(0)[0] across all root mixtures (:165) instead
of per-mixture as MATLAB does (detect_fast.m:46-48); and the XML
reader DESTROYS multi-mixture deformation indexing — a non-scalar
defid list is replaced by the single entry 0
(src/FileStorageModel.cpp:148-152), so every part aliases
defs[0]/anchors[0] for mixture 0 and mixtures >= 1 index out of
bounds (observed as garbage scores or segfaults). That last defect is
why the e2e comparisons here use nmix=1 models: the reference binary
cannot faithfully load a multi-mixture model through its XML path at
all (test_reference_xml_reader_drops_multimixture_defid pins the
evidence).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import refcpp  # noqa: E402

from partsbaseddetector_tpu import PartsBasedDetector, make_synthetic_model
from partsbaseddetector_tpu.models.filestorage import FileStorageModel
from partsbaseddetector_tpu.ops import reference as port

pytestmark = pytest.mark.skipif(
    not refcpp.available(),
    reason="reference C++ oracle unavailable (no /root/reference, g++, or OpenCV)",
)


def _strong_springs(model, qscale=15.0, lscale=3.0):
    """Scale deformation weights up so optimal part placements are
    well-separated (the synthetic trainer-init springs are weak enough
    that equal-scoring placements — which C++ and MATLAB tie-break
    differently — are common)."""
    model.defs = [
        np.array([d[0] * qscale, d[1] * lscale, d[2] * qscale, d[3] * lscale],
                 np.float32)
        for d in model.defs
    ]
    return model


def _single_scale_model(nparts, nmix, seed, thresh):
    """interval=1 models on 64x72 images have exactly one pyramid scale
    (nscales = 1 + floor(log2(64/40)) = 1, src/HOGFeatures.cpp:99), so
    the comparison is pyramid-free: the C++ path resizes by 1.0 (a
    no-op) while the multi-scale path would diverge legitimately
    (cv::resize/pyrDown vs the MATLAB resample weights we implement).
    """
    model = make_synthetic_model(
        nparts=nparts, nmix=nmix, fsize=(3, 3), sbin=8, interval=1,
        thresh=thresh, seed=seed,
    )
    return _strong_springs(model)


def _detect_both(model, im, tmp_path, max_detections=256):
    xml = str(tmp_path / "model.xml")
    FileStorageModel.write(model, xml)
    # the C++ demo's native input is BGR; ours is RGB (see module doc)
    want = refcpp.detect(xml, np.ascontiguousarray(im[..., ::-1]))
    det = PartsBasedDetector(model, max_detections=max_detections,
                             border_mode="cpp")
    got = det.detect(im)
    return got, want


def _as_xywh(cand):
    p = np.asarray(cand.parts, dtype=np.float64)
    return np.stack(
        [p[:, 0], p[:, 1], p[:, 2] - p[:, 0], p[:, 3] - p[:, 1]], axis=1
    ).astype(np.int64)


@pytest.mark.parametrize("seed", [1, 3, 7, 12, 18])
def test_detect_scores_match_reference_cpp(seed, tmp_path):
    """Candidate count, per-candidate score, component, and ROOT box
    must match the reference binary exactly (scores at f32 tolerance)."""
    model = _single_scale_model(nparts=5, nmix=1, seed=seed, thresh=-12.0)
    rng = np.random.RandomState(seed + 100)
    im = (rng.rand(64, 72, 3) * 255).astype(np.uint8)
    got, want = _detect_both(model, im, tmp_path)
    assert len(got) == len(want) > 0
    for g, (comp, score, boxes) in zip(got, want):
        assert g.component == comp
        assert abs(float(g.score) - score) < 1e-5, (g.score, score)
        np.testing.assert_array_equal(_as_xywh(g)[0], boxes[0])


def test_detect_boxes_match_reference_cpp_tie_free(tmp_path):
    """On a verified tie-free fixture, every part box of every candidate
    matches the reference binary bit-for-bit."""
    model = _single_scale_model(nparts=5, nmix=1, seed=3, thresh=-12.0)
    rng = np.random.RandomState(103)
    im = (rng.rand(64, 72, 3) * 255).astype(np.uint8)
    got, want = _detect_both(model, im, tmp_path)
    assert len(got) == len(want) > 0
    for g, (comp, score, boxes) in zip(got, want):
        assert abs(float(g.score) - score) < 1e-5
        np.testing.assert_array_equal(_as_xywh(g), boxes)


def test_root_scoremap_matches_reference_cpp(tmp_path):
    """With the threshold floored, the oracle emits a candidate per grid
    cell — a full root-score map. Every position (boundary cells
    included, exercising the one-padded occlusion border) must agree
    with our detector's map at f32 tolerance. Positional equality is
    tie-immune, unlike argmax comparisons."""
    model = _single_scale_model(nparts=2, nmix=1, seed=9, thresh=-1e8)
    rng = np.random.RandomState(3)
    im = (rng.rand(64, 72, 3) * 255).astype(np.uint8)
    got, want = _detect_both(model, im, tmp_path, max_detections=512)
    assert len(got) == len(want) > 0

    def smap(items):
        out = {}
        for comp, score, root_xy in items:
            out[root_xy] = score
        return out

    ref = smap((c, s, (int(b[0][0]), int(b[0][1]))) for c, s, b in want)
    ours = smap(
        (g.component, float(g.score),
         (int(_as_xywh(g)[0][0]), int(_as_xywh(g)[0][1])))
        for g in got
    )
    assert set(ref) == set(ours)
    for k, s in ref.items():
        assert abs(ours[k] - s) < 1e-5, (k, ours[k], s)


def test_reference_xml_reader_drops_multimixture_defid(tmp_path):
    """Living evidence for the defid defect (module docstring): the
    reference's own reader parses a 2-mixture model's per-part defid
    lists as the single entry 0, while scalar (1-mixture) defids parse
    faithfully. Our reader keeps the full tables (test_models.py), so
    this is a documented reference defect, not replicated."""
    xml = str(tmp_path / "mix2.xml")
    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(3, 3), sbin=8, interval=1, thresh=-1.0,
        seed=2, chain=True,
    )
    FileStorageModel.write(model, xml)
    lines = refcpp.dump_indexers(xml).strip().splitlines()
    assert len(lines) == 3
    for p, line in enumerate(lines):
        toks = line.split()
        d0 = toks.index("defid")
        b0 = toks.index("biasid")
        assert toks[d0 + 1 : b0] == ["0"], line  # list defid -> [0]
        # filterid/biasid survive: the defect is defid-specific
        f0 = toks.index("filterid")
        want_fid = [str(int(v)) for v in model.filterid[0][p]]
        assert toks[f0 + 1 : d0] == want_fid, line

    xml1 = str(tmp_path / "mix1.xml")
    model1 = make_synthetic_model(
        nparts=3, nmix=1, fsize=(3, 3), sbin=8, interval=1, thresh=-1.0,
        seed=2, chain=True,
    )
    FileStorageModel.write(model1, xml1)
    lines1 = refcpp.dump_indexers(xml1).strip().splitlines()
    for p, line in enumerate(lines1):
        toks = line.split()
        d0 = toks.index("defid")
        b0 = toks.index("biasid")
        want_did = [str(int(v)) for v in model1.defid[0][p]]
        assert toks[d0 + 1 : b0] == want_did, line  # scalar defid survives


@pytest.mark.parametrize("h,w,seed", [(64, 72, 3), (48, 56, 5), (80, 64, 8)])
def test_hog_matches_reference_cpp(h, w, seed, tmp_path):
    """HOGFeatures<float>::features (the C++ twin of features.cc) must
    equal our HOG port given each side's native channel order."""
    rng = np.random.RandomState(seed)
    im = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    out = str(tmp_path / "hog.bin")
    feats = refcpp.hog_pyramid(
        np.ascontiguousarray(im[..., ::-1]), sbin=8, interval=1, out_path=out
    )
    assert len(feats) == 1
    cpp = feats[0].reshape(feats[0].shape[0], -1, 32)
    ours = port.hog(im.astype(np.float64), 8)
    assert cpp.shape == ours.shape
    np.testing.assert_allclose(
        cpp.astype(np.float64), ours, rtol=0, atol=2e-4
    )
