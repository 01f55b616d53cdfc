"""QP solver, feature extraction invariant, latent training, builders."""

import numpy as np
import pytest

from partsbaseddetector_tpu.models.model import make_synthetic_model
from partsbaseddetector_tpu.ops.reference_pipeline import (
    detect_reference,
    feature_pyramid,
)
from partsbaseddetector_tpu.train.builder import (
    build_model,
    cluster_parts,
    init_part_model,
    merge_models,
    relative_part_positions,
)
from partsbaseddetector_tpu.train.data import point_to_box
from partsbaseddetector_tpu.train.features import (
    Placement,
    placement_feature,
    reconstruct_score,
)
from partsbaseddetector_tpu.train.layout import ParamLayout
from partsbaseddetector_tpu.train.qp import QPSolver


# ---------------------------------------------------------------------------
# The score-reconstruction invariant (detect.m:139-146): w . phi must
# reproduce the DP root score — the strongest single check of the whole
# conv + DT + DP + bias semantics.
# ---------------------------------------------------------------------------


def test_score_reconstruction_invariant():
    model = make_synthetic_model(
        nparts=5, nmix=2, fsize=(4, 4), sbin=8, interval=2, thresh=-1e9, seed=21
    )
    rng = np.random.RandomState(0)
    im = (rng.rand(120, 140, 3) * 255).astype(np.float64)
    dets = detect_reference(im, model, thresh=-1e9)
    assert dets
    layout = ParamLayout.build(model)
    feats, _, _, _ = feature_pyramid(im, model)
    for d in dets[:8]:
        pl = Placement(
            level=d["level"],
            component=d["component"],
            xs=d["xs"],
            ys=d["ys"],
            mixtures=d["mixtures"],
        )
        got = reconstruct_score(model, layout, feats, pl)
        assert abs(got - d["score"]) < 1e-5, (got, d["score"])


def test_layout_roundtrip():
    model = make_synthetic_model(nparts=4, nmix=2, seed=22)
    layout = ParamLayout.build(model)
    w = layout.model_to_vec(model)
    m2 = make_synthetic_model(nparts=4, nmix=2, seed=22)
    for i in range(len(m2.filters)):
        m2.filters[i] = np.zeros_like(m2.filters[i])
    m2 = layout.vec_to_model(w, m2)
    np.testing.assert_allclose(m2.filters[1], model.filters[1], atol=1e-6)
    np.testing.assert_allclose(m2.biases, model.biases, atol=1e-6)
    # def quads have w0 floor and noneg registered
    assert len(layout.noneg) == 2 * len(model.defs)
    assert (layout.w0[layout.noneg] == 0.01).all()


# ---------------------------------------------------------------------------
# QP solver
# ---------------------------------------------------------------------------


def _toy_layout(dim):
    import dataclasses

    return ParamLayout(
        bias_off=np.zeros(0, dtype=np.int64),
        filter_off=np.zeros(0, dtype=np.int64),
        filter_len=np.zeros(0, dtype=np.int64),
        def_off=np.zeros(0, dtype=np.int64),
        length=dim,
        w0=np.zeros(dim),
        wreg=np.ones(dim),
        noneg=np.zeros(0, dtype=np.int64),
    )


def test_qp_separable_problem():
    """Linearly separable data: the QP must find a separating w with
    dual <= primal and a shrinking duality gap."""
    rng = np.random.RandomState(0)
    dim = 10
    w_true = rng.randn(dim)
    layout = _toy_layout(dim)
    qp = QPSolver(layout, nmax=200, cpos=1.0, cneg=1.0, seed=1)
    for i in range(100):
        x = rng.randn(dim) * 2
        label = 1 if (x @ w_true) > 0 else -1
        qp.write(x, (label, i, 0, 0), label)
    qp.opt(tol=0.01, iters=2000)
    w = qp.actual_w()
    correct = 0
    for i in range(qp.n):
        # stored x is label*phi (cpos=1, wreg=1): sign(w.x) > 0 means right
        correct += (qp.x[i] @ w) > 0
    assert correct >= 95, f"only {correct}/100 separated"
    assert qp.lb <= qp.ub + 1e-6
    assert 1 - qp.lb / qp.ub < 0.05


def test_qp_per_id_constraint():
    """Examples sharing an id share one slack: sum of their alphas <= 1."""
    rng = np.random.RandomState(2)
    dim = 6
    layout = _toy_layout(dim)
    qp = QPSolver(layout, nmax=50, cpos=1.0, cneg=1.0, seed=3)
    for i in range(30):
        x = rng.randn(dim)
        qp.write(x, (-1, i % 5, 0, 0), label=-1)  # 5 id groups
    qp.opt(tol=0.02, iters=500)
    group_of, ngroups = qp._id_groups()
    for g in range(ngroups):
        s = qp.a[: qp.n][group_of == g].sum()
        assert s <= 1.0 + 1e-5


def test_qp_noneg_projection():
    layout = _toy_layout(4)
    layout.noneg = np.array([1, 3])
    qp = QPSolver(layout, nmax=20, cpos=1.0, cneg=1.0)
    rng = np.random.RandomState(4)
    for i in range(15):
        qp.write(rng.randn(4), (1 if i % 2 else -1, i, 0, 0), 1 if i % 2 else -1)
    qp.opt(tol=0.05)
    assert (qp.w[layout.noneg] >= 0).all()


# ---------------------------------------------------------------------------
# Builders + data prep
# ---------------------------------------------------------------------------


def test_point_to_box_and_cluster():
    rng = np.random.RandomState(5)
    pa = [0, 0, 1]
    positives = []
    for _ in range(24):
        root = rng.rand(2) * 50 + 30
        p1 = root + [10 + rng.randn(), rng.randn()]
        p2 = p1 + ([0, 10] if rng.rand() > 0.5 else [0, -10]) + rng.randn(2) * 0.3
        positives.append({"points": np.stack([root, p1, p2]), "im": None})
    positives = point_to_box(positives, pa)
    assert positives[0]["boxes"].shape == (3, 4)
    # part 2 has two clear relative-offset clusters (above/below)
    kps = np.stack([ex["points"] for ex in positives])
    sizes = np.array(
        [
            (
                ex["boxes"][0, 3] - ex["boxes"][0, 1] + 1,
                ex["boxes"][0, 2] - ex["boxes"][0, 0] + 1,
            )
            for ex in positives
        ]
    )
    deffeat = relative_part_positions(kps, sizes, (5, 5))
    idx = cluster_parts(deffeat, [1, 1, 2], pa, restarts=10)
    rel = deffeat[2] - deffeat[1]
    up = rel[:, 1] > 0
    assert len(np.unique(idx[2])) == 2
    # cluster assignment separates up from down (each side is pure)
    assert np.unique(idx[2][up]).size == 1
    assert np.unique(idx[2][~up]).size == 1
    assert idx[2][up][0] != idx[2][~up][0]


def test_cluster_parts_poselet():
    from partsbaseddetector_tpu.train.builder import cluster_parts_poselet

    rng = np.random.RandomState(7)
    # two global configurations that only the JOINT offsets distinguish:
    # part 1 sits right of the root in both, part 2 sits above part 1 in
    # config A and below in config B — but part 2's offset TO THE ROOT
    # also flips, so clustering part 1 on root-offset alone (parent
    # clustering) sees one blob, while poselet clustering of part 1 on
    # offsets to {root, part2} separates the configurations.
    feats = []
    labels = []
    for i in range(30):
        root = np.zeros(2)
        p1 = root + [10, 0] + rng.randn(2) * 0.2
        up = i % 2 == 0
        p2 = p1 + ([0, 8] if up else [0, -8]) + rng.randn(2) * 0.2
        feats.append(np.stack([root, p1, p2]))
        labels.append(up)
    kps = np.stack(feats)
    deffeat = [kps[:, p, :] for p in range(3)]
    labels = np.array(labels)

    co = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]])  # chain 0-1-2
    idx = cluster_parts_poselet(deffeat, [1, 2, 2], co, restarts=10)
    # part 1 clusters on (root-p1, p2-p1): configurations separate
    assert np.unique(idx[1][labels]).size == 1
    assert np.unique(idx[1][~labels]).size == 1
    assert idx[1][labels][0] != idx[1][~labels][0]

    # parent-only connectivity reduces to cluster_parts' feature; part 1
    # (constant offset to root) then collapses to one effective cluster
    # geometry — both restarts split arbitrarily, so only check shape
    co_parent = np.array([[0, 1, 0], [1, 0, 0], [0, 1, 0]])
    idx2 = cluster_parts_poselet(deffeat, [1, 1, 2], co_parent, restarts=5)
    assert idx2[2].shape == (30,)
    assert np.unique(idx2[2][labels]).size == 1

    with np.testing.assert_raises(ValueError):
        cluster_parts_poselet(deffeat, [1, 1, 1], np.zeros((3, 3)), restarts=1)


def test_build_and_merge_model():
    rng = np.random.RandomState(6)
    pa = [0, 0]
    n = 10
    deffeat = [rng.rand(n, 2) * 5, rng.rand(n, 2) * 5 + 3]
    idx = [np.zeros(n, dtype=np.int64), (rng.rand(n) > 0.5).astype(np.int64)]
    base = init_part_model([(40, 40)] * n, sbin=8)
    pm0 = init_part_model([(40, 40)] * n, sbin=8)
    pm1 = init_part_model([(40, 40)] * n, sbin=8)
    pm1.filters = [pm1.filters[0], pm1.filters[0] + 1]
    model = build_model("t", [pm0, pm1], deffeat, idx, pa, base)
    model.validate()
    assert model.nparts(0) == 2
    assert model.nmixtures(0, 1) == 2
    assert model.biasid[0][1].shape == (1, 2)
    merged = merge_models([model, model])
    merged.validate()
    assert merged.ncomponents == 2
    np.testing.assert_allclose(
        merged.filters[len(model.filters)], model.filters[0]
    )


def test_scale_offset_parts_and_invariant():
    """Parts an octave below the root (anchor ds=1, detect_fast.m:93-105):
    the reference pipeline must place the child on the finer level and
    the score-reconstruction invariant must still hold."""
    model = make_synthetic_model(
        nparts=2, nmix=1, fsize=(3, 3), sbin=8, interval=2, thresh=-1e9, seed=60
    )
    model.anchors[model.defid[0][1][0]][2] = 1  # ds = 1
    rng = np.random.RandomState(0)
    im = (rng.rand(130, 140, 3) * 255).astype(np.float64)
    dets = detect_reference(im, model, thresh=-1e9)
    assert dets, "should detect at coarse root levels"
    layout = ParamLayout.build(model)
    feats, _, _, _ = feature_pyramid(im, model)
    from partsbaseddetector_tpu.train.features import part_levels

    for d in dets[:5]:
        levels = part_levels(model, 0, d["level"])
        assert levels[1] == d["level"] - model.interval
        pl = Placement(
            level=d["level"],
            component=d["component"],
            xs=d["xs"],
            ys=d["ys"],
            mixtures=d["mixtures"],
        )
        got = reconstruct_score(model, layout, feats, pl)
        assert abs(got - d["score"]) < 1e-5, (got, d["score"])
