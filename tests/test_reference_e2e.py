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
  - part argmins: the C++ DT composes its argmin indices incorrectly
    (DistanceTransform.hpp:236-245 — see the multi-mixture section
    below), so the reference's emitted child placements are a
    coordinate-descent pair that does not generally achieve the root
    score its DP reports. Score VALUES compose correctly and match
    ours; fixtures whose score landscape is peaked enough that the
    defective pair coincides with the argmax assert full box identity
    (round-2 notes attributed residual box mismatches to tie-breaking;
    score reconstruction this round showed the reference placements
    score strictly lower — the composition defect is the real cause).

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


def test_reference_scalar_defid_multimixture_is_oob(tmp_path):
    """Behavioral pin of the *second* half of the XML defect: even the
    scalar-defid form (one shared def per part — the only multi-mixture
    defid the reader keeps, FileStorageModel.cpp:148-152) cannot carry a
    K>=2 model. The DP calls defw(m)/anchor(m) for every filter mixture
    m (src/DynamicProgram.cpp:121-125) and those index the length-1
    defid vector at m (include/Parts.hpp:179-183) — out of bounds, so
    the detections are garbage: they disagree with the SAME model run
    through the raw oracle path (which carries full shared-def tables).
    Conclusion: no XML whatsoever can faithfully carry a multi-mixture
    model into the reference binary; multi-mixture parity uses
    refcpp.detect_raw."""
    import re

    model = make_synthetic_model(
        nparts=3, nmix=2, fsize=(3, 3), sbin=8, interval=1, thresh=-16.0,
        seed=2, chain=True,
    )
    for p in range(1, 3):
        model.defid[0][p][:] = int(model.defid[0][p][0])  # shared def
    xml = str(tmp_path / "scalar_defid.xml")
    FileStorageModel.write(model, xml)

    def scalarize(m):
        vals = m.group(1).split()
        return (
            f"<defid>{vals[0]}</defid>" if len(set(vals)) == 1 else m.group(0)
        )

    txt = re.sub(
        r"<defid>([^<]+)</defid>", scalarize, open(xml).read()
    )
    open(xml, "w").write(txt)
    # the reader DOES keep the scalar defid (unlike list defids) ...
    lines = refcpp.dump_indexers(xml).strip().splitlines()
    for p, line in enumerate(lines[1:], start=1):
        toks = line.split()
        d0, b0 = toks.index("defid"), toks.index("biasid")
        assert toks[d0 + 1 : b0] == [str(int(model.defid[0][p][0]))], line
    # ... but detection through it disagrees with the raw-model path on
    # the very same model: the OOB defw/anchor reads poison the DP
    rng = np.random.RandomState(0)
    im = np.ascontiguousarray(
        (rng.rand(64, 72, 3) * 255).astype(np.uint8)[..., ::-1]
    )
    via_xml = refcpp.detect(xml, im)
    via_raw = refcpp.detect_raw(model, im)
    assert len(via_xml) and len(via_raw)
    n = min(len(via_xml), len(via_raw))
    mismatched = sum(
        1
        for (c1, s1, _), (c2, s2, _) in zip(via_xml[:n], via_raw[:n])
        if abs(s1 - s2) > 1e-4
    )
    assert mismatched > n // 2, (
        "expected the OOB defid reads to poison most candidates; if this "
        "ever passes cleanly the defect analysis needs revisiting"
    )


# ---------------------------------------------------------------------------
# Multi-mixture end-to-end parity (raw-model oracle path)
# ---------------------------------------------------------------------------
#
# The reference's XML reader cannot carry a multi-mixture model (defid
# destroyed, pinned above), so these tests reach the reference binary
# through refcpp.detect_raw — oracle_main.cpp::RawModel fills the Model
# fields directly and the REAL distributeModel/HOG/conv/DP/backtrack
# runs. Mixtures get distinct square filter sizes (3x3 vs 5x5 vs 3x3)
# so every emitted box width pins the chosen mixture (Ik) exactly
# (box w = xsize*scale - 1, src/DynamicProgram.cpp:238-240).
#
# Verified reference defect (do not replicate): the C++ DT composes its
# argmin indices incorrectly — DistanceTransform.hpp:236-245 keeps
# Ix(yo, xo) from the row pass (best child x GIVEN child row == the
# output row) and sets Iy(yo, xo) = Iy(yo, Ix(yo, xo)), indexing the
# y-pass table with a child-x coordinate as if it were an output
# column. The resulting (X, Y) is a coordinate-descent pair, not the
# argmax, so the reference's emitted part boxes generally do NOT
# achieve the root score its own DP computes (score VALUES compose
# correctly and match ours to f32). The MATLAB MEX composes correctly
# (matlab/mex/shiftdt.cc:102-108) and is the authoritative semantics
# our kernels pin to. test_multimixture_boxes_explained_by_dt_defect
# proves both directions: our placements reconstruct the root score
# exactly; the reference's equal a NumPy emulation of the defective
# composition on 100% of candidates.


def _mm_model(nparts, nmix, seed, thresh, sizes=(3, 5, 7)):
    """Uniform-K multi-mixture model with per-mixture distinct square
    filter sizes and equalized root biases (the C++ root bias is
    broadcast from bias(0)[0] across mixtures, src/DynamicProgram.cpp:
    162-171, where MATLAB is per-mixture)."""
    model = make_synthetic_model(
        nparts=nparts, nmix=nmix, fsize=(3, 3), sbin=8, interval=1,
        thresh=thresh, seed=seed,
    )
    rng = np.random.RandomState(seed + 77)
    for p in range(nparts):
        for k, fid in enumerate(model.filterid[0][p]):
            s = sizes[k % len(sizes)]
            model.filters[fid] = (rng.randn(s, s, 32) * 0.1).astype(
                np.float32
            )
    root_tbl = model.biasid[0][0]
    v = float(model.biases[root_tbl[0, 0]])
    for idx in root_tbl.ravel():
        model.biases[idx] = v
    model.maxsize = None
    return _strong_springs(model)


def _mm_fixture(nmix, seed):
    model = _mm_model(4, nmix, seed=seed, thresh=-16.0)
    rng = np.random.RandomState(200 + seed)
    im = (rng.rand(64, 72, 3) * 255).astype(np.uint8)
    return model, im


def _detect_both_raw(model, im, max_detections=256):
    want = refcpp.detect_raw(model, np.ascontiguousarray(im[..., ::-1]))
    det = PartsBasedDetector(model, max_detections=max_detections,
                             border_mode="cpp")
    got = det.detect(im)
    return got, want


def test_detect_raw_equals_xml_path_nmix1(tmp_path):
    """The raw-model oracle path must be indistinguishable from the XML
    path on a model the XML reader CAN carry (nmix=1)."""
    model = _single_scale_model(nparts=5, nmix=1, seed=3, thresh=-12.0)
    rng = np.random.RandomState(103)
    im = (rng.rand(64, 72, 3) * 255).astype(np.uint8)
    imb = np.ascontiguousarray(im[..., ::-1])
    xml = str(tmp_path / "m.xml")
    FileStorageModel.write(model, xml)
    via_xml = refcpp.detect(xml, imb)
    via_raw = refcpp.detect_raw(model, imb)
    assert len(via_xml) == len(via_raw) > 0
    for (c1, s1, b1), (c2, s2, b2) in zip(via_xml, via_raw):
        assert c1 == c2 and abs(s1 - s2) < 1e-6
        np.testing.assert_array_equal(b1, b2)


@pytest.mark.parametrize("nmix,seed", [(2, 5), (2, 10), (3, 5), (3, 12)])
def test_multimixture_scores_match_reference_cpp(nmix, seed):
    """Candidate count, per-candidate score, component, ROOT box and
    root mixture (via the root box size) must match the reference
    binary exactly on nmix>=2 models — this pins the mixture-combine
    max, the (L, K) pairwise bias tables, and the root mixture argmax
    against the reference's real DynamicProgram
    (src/DynamicProgram.cpp:110-171)."""
    model, im = _mm_fixture(nmix, seed)
    got, want = _detect_both_raw(model, im)
    assert len(got) == len(want) > 0
    for g, (comp, score, boxes) in zip(got, want):
        assert g.component == comp
        assert abs(float(g.score) - score) < 1e-5, (g.score, score)
        np.testing.assert_array_equal(_as_xywh(g)[0], boxes[0])


def _mm_placement_scorer(model, im):
    """Exact (float64) tree-score of a placement in grid coordinates,
    from independently computed responses — w . phi for the cpp border
    mode on a single-scale model."""
    from partsbaseddetector_tpu.ops import reference as port
    from partsbaseddetector_tpu.ops.reference_pipeline import same_conv_cpp

    feat = port.hog(im.astype(np.float64), 8)
    P = model.nparts(0)
    resp = {}
    for p in range(P):
        for k, fid in enumerate(model.filterid[0][p]):
            resp[(p, k)] = same_conv_cpp(
                feat, model.filters[fid].astype(np.float64)
            )

    def score(xs, ys, ms):
        s = float(model.biases[model.biasid[0][0][0, ms[0]]])
        for p in range(P):
            s += resp[(p, ms[p])][ys[p], xs[p]]
            if p > 0:
                par = model.parentid[0][p]
                s += model.biases[model.biasid[0][p][ms[par], ms[p]]]
                d = model.defs[model.defid[0][p][ms[p]]].astype(np.float64)
                ax, ay = model.anchors[model.defid[0][p][ms[p]]][:2]
                dx = xs[par] + ax - xs[p]
                dy = ys[par] + ay - ys[p]
                s -= d[0] * dx * dx + d[1] * dx + d[2] * dy * dy + d[3] * dy
        return s

    return score


def _to_grid(boxes, model):
    """Pixel xywh -> grid coords + mixture ids (sbin=8, single scale;
    mixture from the box size: w = xsize*scale - 1)."""
    size_to_k = {}
    for k, fid in enumerate(model.filterid[0][0]):
        size_to_k[model.filters[fid].shape[0] * 8 - 1] = k
    xs = boxes[:, 0] // 8 + 1
    ys = boxes[:, 1] // 8 + 1
    ms = np.array([size_to_k[int(w)] for w in boxes[:, 2]])
    return xs, ys, ms


def _defective_dt(score, d, ax, ay):
    """NumPy emulation of the reference DT's argmin composition defect
    (values exact, indices per DistanceTransform.hpp:236-245)."""
    H, W = score.shape
    xs = np.arange(W)
    tmp = np.zeros((H, W))
    Ix = np.zeros((H, W), int)
    for q in range(W):
        dx = q + ax - xs
        val = score - (d[0] * dx * dx + d[1] * dx)[None, :]
        Ix[:, q] = val.argmax(1)
        tmp[:, q] = val.max(1)
    ysr = np.arange(H)
    out = np.zeros((H, W))
    Iy = np.zeros((H, W), int)
    for yo in range(H):
        dy = yo + ay - ysr
        val = tmp - (d[2] * dy * dy + d[3] * dy)[:, None]
        Iy[yo, :] = val.argmax(0)
        out[yo, :] = val.max(0)
    Iy_final = np.zeros((H, W), int)
    for m in range(H):
        Iy_final[m, :] = Iy[m, Ix[m, :]]
    return out, Ix, Iy_final


@pytest.mark.parametrize("nmix,seed", [(2, 10), (3, 5)])
def test_multimixture_boxes_explained_by_dt_defect(nmix, seed):
    """Two-sided part-box evidence on multi-mixture models:
    (a) every OUR candidate's part placement reconstructs the reported
        root score exactly (true argmax, the MATLAB semantics);
    (b) every REFERENCE candidate's part boxes (positions AND mixture
        choices via box sizes) equal a NumPy emulation of the C++ DT's
        defective argmin composition, on 100% of candidates."""
    model, im = _mm_fixture(nmix, seed)
    got, want = _detect_both_raw(model, im)
    assert len(got) == len(want) > 0
    scorer = _mm_placement_scorer(model, im)

    # (a) ours reconstruct exactly (mixtures from the Ik backtrack)
    for g in got:
        xywh = _as_xywh(g)
        xs, ys = xywh[:, 0] // 8 + 1, xywh[:, 1] // 8 + 1
        assert abs(scorer(xs, ys, g.mixtures) - float(g.score)) < 2e-5

    # (b) reference boxes == defective-composition prediction
    from partsbaseddetector_tpu.ops import reference as port
    from partsbaseddetector_tpu.ops.reference_pipeline import same_conv_cpp

    feat = port.hog(im.astype(np.float64), 8)
    P, K = model.nparts(0), nmix
    par = model.parentid[0]
    resp = {
        (p, k): same_conv_cpp(
            feat, model.filters[model.filterid[0][p][k]].astype(np.float64)
        )
        for p in range(P)
        for k in range(K)
    }
    children = {p: [q for q in range(1, P) if par[q] == p] for p in range(P)}
    acc, tables = {}, {}

    def process(p):
        a = {k: resp[(p, k)].copy() for k in range(K)}
        for q in children[p]:
            process(q)
            tabs = {}
            for l in range(K):
                outs, Ixs, Iys = [], [], []
                for k in range(K):
                    d = model.defs[model.defid[0][q][k]].astype(np.float64)
                    ax, ay = model.anchors[model.defid[0][q][k]][:2]
                    b = model.biases[model.biasid[0][q][l, k]]
                    o, Ix, Iy = _defective_dt(acc[q][k], d, int(ax), int(ay))
                    outs.append(o + b)
                    Ixs.append(Ix)
                    Iys.append(Iy)
                stack = np.stack(outs)
                Ik = stack.argmax(0)
                a[l] += stack.max(0)
                tabs[l] = (
                    np.take_along_axis(np.stack(Ixs), Ik[None], 0)[0],
                    np.take_along_axis(np.stack(Iys), Ik[None], 0)[0],
                    Ik,
                )
            tables[q] = tabs
        acc[p] = a

    process(0)
    rootbias = model.biases[model.biasid[0][0][0, 0]]
    rootv = np.stack([acc[0][k] + rootbias for k in range(K)])
    rmix = rootv.argmax(0)

    nonmax_seen = 0
    for comp, score, boxes in want:
        xs, ys, ms = _to_grid(np.asarray(boxes, np.int64), model)
        x0, y0 = int(xs[0]), int(ys[0])
        pxs = np.zeros(P, int)
        pys = np.zeros(P, int)
        pms = np.zeros(P, int)
        pxs[0], pys[0], pms[0] = x0, y0, rmix[y0, x0]
        for p in range(1, P):
            pq = par[p]
            Ixm, Iym, Ik = tables[p][pms[pq]]
            y, x = pys[pq], pxs[pq]
            pxs[p], pys[p], pms[p] = Ixm[y, x], Iym[y, x], Ik[y, x]
        np.testing.assert_array_equal(pxs, xs)
        np.testing.assert_array_equal(pys, ys)
        np.testing.assert_array_equal(pms, ms)
        # and the defect is REAL here: at least one reference placement
        # scores strictly below the root score it is reported with
        if scorer(xs, ys, ms) < score - 1e-4:
            nonmax_seen += 1
    assert nonmax_seen > 0, (
        "fixture must exhibit the non-argmax placements that pin the "
        "reference defect"
    )


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
