"""Budgeted float32 block-sparse QP example cache (train.m:44-67,
qp_one_sparse.cc engineering): memory sizing + solver equivalence."""

import numpy as np

from partsbaseddetector_tpu.models.model import (
    make_person_like_model,
    make_synthetic_model,
)
from partsbaseddetector_tpu.train.layout import ParamLayout
from partsbaseddetector_tpu.train.qp import QPSolver, example_sparselen

def _toy_layout(dim):
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


def _sparse_placement_phi(rng, layout, model, nnz):
    """A synthetic placement feature with the real sparsity pattern:
    one bias + one filter block + one def block per part."""
    phi = np.zeros(layout.length)
    c = 0
    nparts = model.nparts(c)
    for p in range(nparts):
        # one mixture's bias indicator
        bid = int(np.asarray(model.biasid[c][p]).ravel()[0])
        phi[layout.bias_off[bid]] = 1.0
        fid = int(
            rng.choice(np.asarray(model.filterid[c][p]).ravel())
        )
        off, ln = layout.filter_off[fid], layout.filter_len[fid]
        phi[off : off + ln] = rng.rand(ln).astype(np.float32)
        if p > 0:
            did = int(np.asarray(model.defid[c][p]).ravel()[0])
            j = layout.def_off[did]
            phi[j : j + 4] = rng.randn(4)
    return phi


def test_person26_budget_fits_5k_examples_in_2gb():
    """The VERDICT-r3 scaling requirement: a person26-dim parameter
    layout must cache >=5000 mined examples inside a 2 GB budget — the
    reference's own sizing (train.m:44-67 nmax = budget/sparselen)."""
    model = make_person_like_model()
    layout = ParamLayout.build(model)
    nnz, nblocks = example_sparselen(model)
    # sanity: the placement support is much smaller than the dense dim
    assert nnz < layout.length / 2, (nnz, layout.length)

    qp = QPSolver(layout, memory_gb=2.0, example_nnz=nnz, seed=0)
    assert qp.storage == "sparse"
    assert qp.nmax >= 5000, qp.nmax

    # write a sample of realistic placements and check the measured
    # per-example footprint extrapolates under the budget
    rng = np.random.RandomState(0)
    nsample = 64
    for i in range(nsample):
        phi = _sparse_placement_phi(rng, layout, model, nnz)
        assert qp.write(phi, (-1, i, 0, 0), label=-1)
    per_ex = qp.cache_bytes / nsample
    assert per_ex * 5000 <= 2.0e9, (per_ex, per_ex * 5000)
    # the dense float64 cache could not hold 5k examples in 2 GB
    assert 5000 * layout.length * 8 > 2.0e9


def test_sparse_solver_matches_dense():
    """f32 block-sparse storage must reproduce the dense f64 solver's
    optimum (storage rounds once to f32; accumulation stays f64 — the
    reference's single/double split in qp_one_sparse.cc)."""
    rng = np.random.RandomState(1)
    dim = 24
    w_true = rng.randn(dim)
    layout = _toy_layout(dim)
    xs, labels = [], []
    for i in range(80):
        x = rng.randn(dim) * 2
        # ~60% sparse like real placement features
        x[rng.rand(dim) < 0.6] = 0.0
        xs.append(x)
        labels.append(1 if (x @ w_true) > 0 else -1)

    qp_d = QPSolver(layout, nmax=100, cpos=1.0, cneg=1.0, seed=7)
    qp_s = QPSolver(
        layout, nmax=100, cpos=1.0, cneg=1.0, seed=7, storage="sparse"
    )
    for i, (x, lb) in enumerate(zip(xs, labels)):
        qp_d.write(x, (lb, i, 0, 0), lb)
        qp_s.write(x, (lb, i, 0, 0), lb)
    qp_d.opt(tol=0.005, iters=3000)
    qp_s.opt(tol=0.005, iters=3000)
    # both converged to the same QP optimum
    assert abs(qp_d.lb - qp_s.lb) / max(abs(qp_d.lb), 1e-9) < 5e-3
    wd, ws = qp_d.actual_w(), qp_s.actual_w()
    np.testing.assert_allclose(ws, wd, rtol=0.05, atol=5e-3)
    # per-id constraint holds in sparse mode too
    group_of, ngroups = qp_s._id_groups()
    for g in range(ngroups):
        assert qp_s.a[: qp_s.n][group_of == g].sum() <= 1.0 + 1e-5


def test_sparse_prune_and_refresh():
    """prune() reorders sparse rows correctly and refresh() rebuilds w
    from the surviving alphas."""
    rng = np.random.RandomState(3)
    dim = 12
    layout = _toy_layout(dim)
    qp = QPSolver(
        layout, nmax=30, cpos=1.0, cneg=1.0, seed=5, storage="sparse"
    )
    for i in range(30):
        x = rng.randn(dim)
        x[rng.rand(dim) < 0.5] = 0.0
        qp.write(x, (1 if i % 2 else -1, i, 0, 0), 1 if i % 2 else -1)
    assert qp.full
    qp.opt(tol=0.02)
    w_before = qp.actual_w().copy()
    bytes_before = qp.cache_bytes
    n = qp.prune()
    assert 0 < n <= 30
    assert qp.cache_bytes <= bytes_before
    # pruning non-support examples must not move the solution
    np.testing.assert_allclose(qp.actual_w(), w_before, atol=1e-10)
    # and the cache keeps optimizing after a prune
    qp.opt(tol=0.02)
    assert qp.lb <= qp.ub + 1e-9


def test_latent_train_sparse_budget_smoke():
    """train() end-to-end with the budgeted sparse cache on a small
    synthetic model (miner='reference' keeps this CPU-only and fast)."""
    from partsbaseddetector_tpu.train.latent import train

    model = make_synthetic_model(
        nparts=2, nmix=1, fsize=(3, 3), sbin=8, interval=2, thresh=-1e9,
        seed=11,
    )
    rng = np.random.RandomState(4)
    im_pos = (rng.rand(96, 96, 3) * 255).astype(np.float64)
    boxes = np.asarray([[24.0, 24.0, 48.0, 48.0], [40.0, 40.0, 64.0, 64.0]])
    positives = [{"im": im_pos, "points": None, "boxes": boxes}]
    negatives = [{"im": (rng.rand(96, 96, 3) * 255).astype(np.float64)}]
    out = train(
        model,
        positives,
        negatives,
        warp=False,
        iters=1,
        miner="reference",
        qp_memory_gb=0.01,
        max_neg_per_image=8,
    )
    assert out is not None
    assert np.isfinite(out.thresh)
