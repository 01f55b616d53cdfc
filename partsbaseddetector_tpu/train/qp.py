"""Dual coordinate-descent QP for the structural SVM.

Dense NumPy re-expression of the reference's global QP cache and
solver (matlab/learning/qp_write.m, qp_one.m, qp_opt.m, qp_prune.m,
qp_refresh.m and the qp_one_sparse.cc MEX kernel). The block-sparse
example encoding there is a CPU-memory optimization; the semantics kept
here are:

  - standard-form substitution v = (w - w0) * wreg with
    x' = C * (+-phi) / wreg, b' = C * (1 - w0 . (+-phi)) so the dual box
    is alpha in [0, 1] with a per-id linear constraint
    sum_{j in id} alpha_j <= 1 (one slack per id);
  - one pass = randomized coordinate descent over the support set with
    (a) plain projected updates, (b) pairwise alpha exchange when the
    id's linear constraint is active (qp_one.m:96-140), and support
    flag clearing for alpha=0, G>0 examples;
  - non-negativity clamps on v at the deformation quadratic positions
    after every update (qp_one_sparse.cc:247-255);
  - qp_opt: iterate passes until duality gap < tol with the true upper
    bound computed from per-id max slacks (qp_opt.m computeloss);
  - prune: drop non-support examples when the cache fills, keeping
    fixed examples (warped positives) pinned.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .layout import ParamLayout


class QPSolver:
    def __init__(
        self,
        layout: ParamLayout,
        nmax: int,
        cpos: float = 0.002,
        cneg: float = 0.002,
        seed: int = 0,
    ):
        self.layout = layout
        dim = layout.length
        self.nmax = int(nmax)
        self.cpos, self.cneg = float(cpos), float(cneg)
        self.x = np.zeros((self.nmax, dim), dtype=np.float64)
        self.b = np.zeros(self.nmax)
        self.d = np.zeros(self.nmax)  # Gram diagonal
        self.a = np.zeros(self.nmax)  # alphas
        self.ids = np.zeros((self.nmax, 5), dtype=np.int64)
        self.sv = np.zeros(self.nmax, dtype=bool)
        self.svfix = np.zeros(self.nmax, dtype=bool)
        self.n = 0
        self.w = np.zeros(dim)  # v, standard form
        self.l = 0.0
        self.lb = -np.inf
        self.ub = np.inf
        self.rng = np.random.RandomState(seed)

    # -- example management ---------------------------------------------------

    @property
    def full(self) -> bool:
        return self.n >= self.nmax

    def write(self, phi: np.ndarray, example_id, label: int, fixed=False) -> bool:
        """Add one example; phi is the raw feature, label +-1
        (qp_write.m standard-form substitution)."""
        if self.full:
            return False
        c = self.cpos if label > 0 else self.cneg
        s = phi if label > 0 else -phi
        i = self.n
        self.x[i] = c * s / self.layout.wreg
        self.b[i] = c * (1.0 - self.layout.w0 @ s)
        self.d[i] = self.x[i] @ self.x[i]
        self.a[i] = 0.0
        eid = np.asarray(example_id, dtype=np.int64).ravel()
        self.ids[i, : len(eid)] = eid
        self.ids[i, 0] = label
        self.sv[i] = True
        self.svfix[i] = fixed
        self.n += 1
        return True

    # -- weight access ---------------------------------------------------------

    def actual_w(self) -> np.ndarray:
        """Real model weights: w = v / wreg + w0 (qp_w.m)."""
        return self.w / self.layout.wreg + self.layout.w0

    def set_w_from_model_vec(self, wvec: np.ndarray) -> None:
        """Seed v from real model weights: v = (w - w0) * wreg
        (train.m:68-71)."""
        self.w = (wvec - self.layout.w0) * self.layout.wreg

    def score(self, idx) -> np.ndarray:
        return self.x[idx] @ self.w

    def score_positives(self) -> np.ndarray:
        """Raw (unscaled) scores w.phi of the positive examples
        (qp_scorepos analog): x.v = C*phi.(v/wreg) and
        b = C*(1 - w0.phi), so w.phi = x.v/C + 1 - b/C."""
        idx = np.flatnonzero(self.ids[: self.n, 0] > 0)
        return self.score(idx) / self.cpos + 1.0 - self.b[idx] / self.cpos

    def reset_examples(self) -> None:
        """Drop all cached examples (train.m:75 'qp.n = 0')."""
        self.n = 0
        self.a[:] = 0
        self.sv[:] = False
        self.svfix[:] = False

    # -- solver -----------------------------------------------------------------

    def refresh(self) -> None:
        """Recompute v, l, lb from alphas, small alphas first
        (qp_refresh.m)."""
        idx = np.flatnonzero(self.a[: self.n] > 0)
        if len(idx):
            order = idx[np.argsort(self.a[idx], kind="stable")]
            self.w = self.x[order].T @ self.a[order]
            self.l = float(self.b[order] @ self.a[order])
        else:
            self.w = np.zeros_like(self.w)
            self.l = 0.0
        nn = self.layout.noneg
        self.w[nn] = np.maximum(self.w[nn], 0)
        self.lb = self.l - 0.5 * float(self.w @ self.w)

    def _id_groups(self) -> Tuple[np.ndarray, np.ndarray]:
        """Group indices [0, n) by example id. Returns (group_of (n,),
        ngroups)."""
        keys = self.ids[: self.n]
        _, group_of = np.unique(keys, axis=0, return_inverse=True)
        return group_of, group_of.max() + 1 if self.n else 0

    def one(self) -> float:
        """One randomized coordinate-descent pass (qp_one.m). Returns
        the estimated loss for the upper bound."""
        idx = np.flatnonzero(self.sv[: self.n])
        assert len(idx) > 0
        self.rng.shuffle(idx)
        group_of, ngroups = self._id_groups()
        c = 1.0
        # per-group alpha sums and an example holding positive alpha
        g_sum = np.zeros(ngroups)
        g_holder = np.full(ngroups, -1, dtype=np.int64)
        for i in range(self.n):
            g = group_of[i]
            g_sum[g] += self.a[i]
            if self.a[i] > 0:
                g_holder[g] = i
        err = np.zeros(ngroups)
        nn = self.layout.noneg

        for i in idx:
            g = group_of[i]
            ci = g_sum[g]
            grad = float(self.w @ self.x[i]) - self.b[i]
            err[g] = max(err[g], -grad)

            if self.a[i] == 0 and grad > 0:
                self.sv[i] = False

            if (self.a[i] == 0 and grad >= 0) or (ci >= c and grad <= 0):
                pg = 0.0
            else:
                pg = grad

            if (
                ci >= c
                and grad < -1e-12
                and self.a[i] < c
                and g_holder[g] != i
                and g_holder[g] >= 0
            ):
                # pairwise exchange within the id block (qp_one.m:96-140)
                i2 = int(g_holder[g])
                g2 = float(self.w @ self.x[i2]) - self.b[i2]
                numer = grad - g2
                if self.a[i] == 0 and numer > 0:
                    numer = 0.0
                    self.sv[i] = False
                if abs(numer) > 1e-12:
                    denom = self.d[i] + self.d[i2] - 2 * float(
                        self.x[i] @ self.x[i2]
                    )
                    da = -numer / max(denom, 1e-12)
                    if da > 0:
                        da = min(min(da, c - self.a[i]), self.a[i2])
                    else:
                        da = max(max(da, -self.a[i]), self.a[i2] - c)
                    self.a[i] += da
                    self.a[i2] -= da
                    self.w += da * (self.x[i] - self.x[i2])
                    self.w[nn] = np.maximum(self.w[nn], 0)
                    self.l += da * (self.b[i] - self.b[i2])
            elif abs(pg) > 1e-12:
                old = self.a[i]
                max_a = max(c - (ci - old), 0.0)
                self.a[i] = min(
                    max(old - grad / max(self.d[i], 1e-12), 0.0), max_a
                )
                da = self.a[i] - old
                self.w += da * self.x[i]
                self.w[nn] = np.maximum(self.w[nn], 0)
                self.l += da * self.b[i]
                g_sum[g] = min(max(ci + da, 0.0), c)
            if self.a[i] > 0:
                g_holder[g] = i

        self.refresh()
        self.sv[: self.n][self.svfix[: self.n]] = True
        self.ub = 0.5 * float(self.w @ self.w) + float(err.sum())
        return float(err.sum())

    def _true_upper_bound(self) -> float:
        """0.5||v||^2 + sum of per-id max positive slacks
        (qp_opt.m computeloss)."""
        group_of, ngroups = self._id_groups()
        slack = self.b[: self.n] - self.x[: self.n] @ self.w
        loss = 0.0
        for g in range(ngroups):
            m = slack[group_of == g].max(initial=0.0)
            loss += max(m, 0.0)
        return 0.5 * float(self.w @ self.w) + loss

    def opt(self, tol: float = 0.05, iters: int = 1000) -> None:
        """Iterate passes until the relative duality gap < tol
        (qp_opt.m)."""
        if self.n == 0:
            return
        self.refresh()
        ub = self._true_upper_bound()
        self.sv[: self.n] = True
        for _ in range(iters):
            self.one()
            lb = self.lb
            ub_est = min(self.ub, ub)
            if lb > 0 and 1 - lb / ub_est < tol:
                ub = min(ub, self._true_upper_bound())
                if 1 - lb / ub < tol:
                    break
                self.sv[: self.n] = True
        self.ub = ub

    def prune(self) -> int:
        """Keep only support vectors (qp_prune.m); alpha>0 and fixed
        examples survive a full cache."""
        if self.sv[: self.n].all():
            self.sv[: self.n] = self.a[: self.n] > 0
            self.sv[: self.n][self.svfix[: self.n]] = True
        keep = np.flatnonzero(self.sv[: self.n])
        n = len(keep)
        assert n > 0
        for arr in (self.x, self.b, self.d, self.a, self.ids, self.sv, self.svfix):
            arr[:n] = arr[keep]
        self.a[n:] = 0
        self.sv[:n] = True
        self.sv[n:] = False
        self.svfix[n:] = False
        self.n = n
        self.refresh()
        return n
