"""Tree min-sum dynamic program + backtracking, batched over scales.

The reference runs an OpenMP loop over (scale, component), and inside it
a sequential leaves->root part loop of per-mixture distance transforms,
mixture max-reductions and score accumulations
(src/DynamicProgram.cpp:80-172, detect_fast.m:40-48 / passmsg). Parts
are stored root-first (parentid[p] < p), so the descending part loop is
a valid topological schedule.

TPU-native re-design: the part loop stays (it is a true data
dependence), but every step is batched over (scales-in-bucket, mixtures,
rows) — the distance transform, the (L_parent, K_child) bias-max
combine, and the accumulation are all dense tensor ops on (S, M, H, W)
blocks. Invalid regions and padded mixture slots carry -inf and can
never win a max, so no ragged bookkeeping survives on device.

Mixture combination semantics follow passmsg (detect_fast.m:118-141):
msg_l = max_k (DT(score_k) + bias[l, k]), pointer tables Ix/Iy/Ik are
stored per parent mixture. Root scoring adds the per-root-mixture bias
then maxes over mixtures (detect_fast.m:46-48; the C++ scalar-bias
broadcast at DynamicProgram.cpp:165-169 is flagged defective in
SURVEY.md §7 — MATLAB semantics are implemented).

Backtracking mirrors detect_fast.m:144-177: threshold the root map,
then walk the tree root->leaves through the pointer tables with pure
gathers, vectorized over a static top-k candidate budget.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import PackedComponent
from .distance_transform import shift_distance_transform_2d_packed

NEG_INF = -jnp.inf


def _scan_schedule() -> str:
    """PBD_DP_SCHEDULE=scan|unrolled (default unrolled).

    `scan` folds the leveled part schedule into one lax.scan body per
    (bucket, component): every level shares ONE pair of DT kernel
    compilations (the TPU backend dedupes identical Mosaic payloads,
    measured in tools/ probes) and the DP subgraph shrinks
    ~#levels-fold. Measured on person26-VGA/v5e: cold build 172 s ->
    ~90-120 s, steady-state 41.3 -> ~54 ms/img — the scan body's
    glue (level-padded slots, score-slab slices, scatter-add
    accumulation, stacked pointer tables) costs ~30% runtime, so the
    unrolled schedule stays the serving default and `scan` is the
    fast-iteration profile (model development, CI, frequently-changing
    image sizes). Falls back to unrolled automatically for anything
    it can't express (octave-offset parts, traced params,
    single-part trees)."""
    import os

    return os.environ.get("PBD_DP_SCHEDULE", "unrolled")


def _tree_min_sum_scan(
    resp: jax.Array,
    comp: PackedComponent,
    valid_extents=None,
) -> Tuple[jax.Array, jax.Array, Dict[int, jax.Array]]:
    """Scan-scheduled min-sum for the homogeneous case (all parts on
    the root's grid, step 1, baked constants).

    Levels are padded to a common width G_max and processed by one
    lax.scan body: part scores come from a hoisted one-hot MXU
    contraction (exact, deterministic), child messages accumulate into
    a (P+1)-row buffer via one scatter-add per level (sibling add
    order may differ from the unrolled schedule's left-associated adds
    by last-ulp only), and one batched 2-D DT runs per level — same
    shapes every level, so each bucket compiles ONE Mosaic kernel
    pair. Dead slots carry -inf bias and zero valid counts: they can
    win nothing and the DT kernel skips their rows and tails
    (dead_heavy=True).
    """
    s, hr, wr, n_filters = resp.shape
    dtype = resp.dtype
    p_total, m_total = comp.filterid.shape
    defw_all, bias_all, root_bias = comp.tensors()

    depth = np.zeros(p_total, dtype=np.int64)
    for p in range(1, p_total):
        depth[p] = depth[int(comp.parentid[p])] + 1
    levels: Dict[int, List[int]] = {}
    for p in range(1, p_total):
        levels.setdefault(int(depth[p]), []).append(p)
    order = sorted(levels, reverse=True)  # deepest first
    nlev = len(order)
    gmax = max(len(levels[d]) for d in order)

    # host-side stacked schedule; dead slots -> dummy part index p_total
    pid = np.full((nlev, gmax), p_total, np.int32)
    par = np.full((nlev, gmax), p_total, np.int32)
    fid = np.zeros((nlev, gmax, m_total), np.int32)
    defw_s = np.zeros((nlev, gmax, m_total, 4), np.float32)
    sx_s = np.zeros((nlev, gmax, m_total), np.float32)
    sy_s = np.zeros((nlev, gmax, m_total), np.float32)
    bias_s = np.full((nlev, gmax, m_total, m_total), -np.inf, np.float32)
    vhp_s = np.zeros((nlev, gmax, s, m_total, wr), np.int32)
    vwp_s = np.zeros((nlev, gmax, s, m_total, hr), np.int32)
    for li, d in enumerate(order):
        for g, p in enumerate(levels[d]):
            pid[li, g] = p
            par[li, g] = int(comp.parentid[p])
            fid[li, g] = comp.filterid[p]
            defw_s[li, g] = defw_all[p]
            sx_s[li, g] = comp.shift_x[p]
            sy_s[li, g] = comp.shift_y[p]
            bias_s[li, g] = bias_all[p]
            if valid_extents is not None:
                f = np.asarray(comp.filterid[p])
                vh_sm = valid_extents[0][:s][:, f]  # (S, M) child extents
                vw_sm = valid_extents[1][:s][:, f]
                # x-pass rows live on the PARENT grid: a row is live up
                # to the parent's valid height (positions beyond it are
                # -inf in the parent's own response downstream)
                pf = np.asarray(comp.filterid[int(comp.parentid[p])])
                vh_par = valid_extents[0][:s][:, pf].max(axis=1)  # (S,)
                vhp_s[li, g] = np.where(
                    np.arange(wr)[None, None, :] < vw_sm[:, :, None],
                    vh_sm[:, :, None], 0,
                )
                vwp_s[li, g] = np.where(
                    np.arange(hr)[None, None, :] < vh_par[:, None, None],
                    vw_sm[:, :, None], 0,
                )
            else:
                vhp_s[li, g] = hr
                vwp_s[li, g] = wr

    # one-hot filter gather for ALL levels at once, hoisted out of the
    # scan body: (S, H, W, F) @ (F, L*G*M) on the MXU — exact (one unit
    # weight per output column) and deterministic. -inf response
    # padding would turn into NaN under the 0-weight products, so it
    # is sanitized to finite float-min first: those positions stay
    # unwinnable in every downstream max, and pointers in fully-dead
    # regions are unreachable from any valid candidate (a finite
    # message implies a finite winning source).
    negf = jnp.asarray(jnp.finfo(dtype).min, dtype)  # finite in dtype
    resp_g = jnp.where(jnp.isfinite(resp), resp, negf)
    onehot = (
        jnp.asarray(fid).reshape(-1)[None, :]
        == jnp.arange(n_filters, dtype=jnp.int32)[:, None]
    ).astype(dtype)  # (F, L*G*M)
    sc_all = jnp.einsum(
        "shwf,fg->shwg", resp_g, onehot,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(s, hr, wr, nlev, gmax, m_total)
    sc_all = jnp.moveaxis(
        sc_all, (3, 4, 5), (0, 1, 3)
    )  # (L, G, S, M, H, W) — sliced per level by the scan

    acc0 = jnp.zeros((p_total + 1, s, m_total, hr, wr), dtype)

    def body(acc, xs):
        sc_l, pid_l, par_l, defw_l, sx_l, sy_l, bias_l, vhp_l, vwp_l = xs
        sc = sc_l + acc[pid_l]
        dt_g, ptr_g = shift_distance_transform_2d_packed(
            sc,
            defw_l[:, None],  # (G, 1, M, 4)
            sx_l[:, None],
            sy_l[:, None],
            dlen_x=wr,
            dlen_y=hr,
            step=1,
            valid_h=vhp_l,
            valid_w=vwp_l,
            dead_heavy=True,  # padded level slots skip their DT tails
        )
        msgs, tbls = [], []
        for g in range(gmax):  # per-slot combine, unrolled-order exact
            dt, ptr = dt_g[g], ptr_g[g]
            b = bias_l[g]  # (L, K)
            packed = [(jnp.int32(k) << 24) | ptr[:, k] for k in range(m_total)]
            msg_l, ptr_l = [], []
            for l in range(m_total):
                best = dt[:, 0] + b[l, 0]
                ptrb = packed[0]
                for k in range(1, m_total):
                    val = dt[:, k] + b[l, k]
                    pred = val > best
                    best = jnp.where(pred, val, best)
                    ptrb = jnp.where(pred, packed[k], ptrb)
                msg_l.append(best)
                ptr_l.append(ptrb)
            msgs.append(jnp.stack(msg_l, axis=1))  # (S, L, H, W)
            tbls.append(jnp.stack(ptr_l, axis=1))
        # parent accumulation: one scatter-add over the slot axis.
        # Duplicate parents (sibling slots) accumulate; XLA's scatter
        # add order over the 8 slots may differ from the unrolled
        # schedule's left-associated order by last-ulp only.
        msg_stack = jnp.stack(msgs)  # (G, S, L, H, W)
        acc = acc.at[par_l].add(msg_stack)
        return acc, jnp.stack(tbls)  # (G, S, L, H, W)

    xs = (
        sc_all, jnp.asarray(pid), jnp.asarray(par),
        jnp.asarray(defw_s, dtype), jnp.asarray(sx_s), jnp.asarray(sy_s),
        jnp.asarray(bias_s, dtype), jnp.asarray(vhp_s), jnp.asarray(vwp_s),
    )
    acc, tbl_stack = jax.lax.scan(body, acc0, xs)

    tables: Dict[int, jax.Array] = {}
    for li, d in enumerate(order):
        for g, p in enumerate(levels[d]):
            tables[p] = tbl_stack[li, g]

    root_idx = np.asarray(comp.filterid[0])  # static gather
    root = jnp.moveaxis(resp[..., root_idx], -1, 1)  # (S, M, H, W)
    root = root + acc[0]
    root = root + jnp.asarray(root_bias, dtype)[None, :, None, None]
    rootv = root[:, 0]
    rooti = jnp.zeros(rootv.shape, jnp.int32)
    for m in range(1, m_total):
        pred = root[:, m] > rootv
        rootv = jnp.where(pred, root[:, m], rootv)
        rooti = jnp.where(pred, m, rooti)
    return rootv, rooti, tables


def tree_min_sum(
    resps,
    comp: PackedComponent,
    tensors=None,
    valid_extents=None,
    bucket_index: int = 0,
    buckets_per_octave: int = 1,
) -> Tuple[jax.Array, jax.Array, Dict[int, Tuple[jax.Array, jax.Array, jax.Array]]]:
    """Min-sum message passing for one component over a scale bucket.

    resps: either a single (S, Hr, Wr, F) response stack (all parts at
        the root's octave) or the list of per-bucket stacks — a part
        with accumulated octave offset d reads bucket_index - d (the
        bucket exactly d octaves finer, whose within-bucket scale index
        matches the root's: level - d*interval). -inf outside valid
        extents.
    tensors: optional traced (defw, bias, root_bias) overriding the
        baked model constants — the differentiable training path.
    valid_extents: optional ((S, F) vh, (S, F) vw) NumPy arrays per
        bucket (list when resps is a list); lets the DT kernel skip
        -inf padding chunks.
    Returns (rootv (S, Hr, Wr) on the root grid, rooti int32, tables
    {p: packed pointers (S, L_par, H_pargrid, W_pargrid)}).
    """
    if not isinstance(resps, (list, tuple)):
        resps = [resps]
        bucket_index = 0
        if valid_extents is not None:
            valid_extents = ([valid_extents[0]], [valid_extents[1]])
    bucket_of = lambda d: bucket_index - d * buckets_per_octave

    p_total, m_total = comp.filterid.shape
    ds = (
        np.asarray(comp.ds_total)
        if comp.ds_total is not None
        else np.zeros(p_total, dtype=np.int64)
    )
    assert bucket_index >= int(ds.max()) * buckets_per_octave, (
        "root bucket must be at least max octave offset octaves coarse "
        "(callers skip coarser-than-possible buckets)"
    )
    root_resp = resps[bucket_of(0)]
    s = root_resp.shape[0]
    dtype = root_resp.dtype
    for r in resps:
        assert r.shape[1] < 4096 and r.shape[2] < 4096, (
            "packed pointers use 12 bits/coordinate"
        )

    # scan schedule: homogeneous trees (all parts on the root grid,
    # baked constants) fold the level loop into one lax.scan — one DT
    # kernel pair per bucket instead of one per level (see
    # _tree_min_sum_scan). Heterogeneous cases keep the unrolled path.
    sched = _scan_schedule()
    homogeneous = (
        tensors is None
        and p_total > 1
        and (ds == 0).all()
        and (np.asarray(comp.step) == 1).all()
    )
    if homogeneous and sched == "scan":
        ve = None
        if valid_extents is not None:
            ve = (
                valid_extents[0][bucket_of(0)],
                valid_extents[1][bucket_of(0)],
            )
        return _tree_min_sum_scan(root_resp, comp, valid_extents=ve)

    defw_all, bias_all, root_bias = (
        tensors if tensors is not None else comp.tensors()
    )

    def part_score(p: int) -> jax.Array:
        idx = np.asarray(comp.filterid[p])  # static gather
        r = resps[bucket_of(int(ds[p]))][:s]  # align within-bucket scales
        return jnp.moveaxis(r[..., idx], -1, 1)  # (S, M, H_p, W_p)

    def grid_of(p: int) -> Tuple[int, int]:
        r = resps[bucket_of(int(ds[p]))]
        return r.shape[1], r.shape[2]

    def _valid_counts(p: int, par: int, score: jax.Array, hr_par: int):
        if valid_extents is None:
            return None, None, None, None
        fid = np.asarray(comp.filterid[p])
        vh_b = valid_extents[0][bucket_of(int(ds[p]))]
        vw_b = valid_extents[1][bucket_of(int(ds[p]))]
        vh_sm = np.ascontiguousarray(vh_b[:s][:, fid])  # (S, M)
        vw_sm = np.ascontiguousarray(vw_b[:s][:, fid])
        # fully-shaped per-row valid counts: rows that are pure bucket
        # padding (x >= child valid width) or that land beyond the
        # parent's valid height get 0 and are skipped whole-tile by the
        # DT kernel
        w_child = score.shape[-1]
        vhp = np.where(
            np.arange(w_child)[None, None, :] < vw_sm[:, :, None],
            vh_sm[:, :, None],
            0,
        ).astype(np.int32)  # (S, M, W_child) for the y pass
        par_fid = np.asarray(comp.filterid[par])
        vh_par = (
            valid_extents[0][bucket_of(int(ds[par]))][:s][:, par_fid]
            .max(axis=1)
        )  # (S,)
        vw_par = (
            valid_extents[1][bucket_of(int(ds[par]))][:s][:, par_fid]
            .max(axis=1)
        )  # (S,)
        vwp = np.where(
            np.arange(hr_par)[None, None, :] < vh_par[:, None, None],
            vw_sm[:, :, None],
            0,
        ).astype(np.int32)  # (S, M, H_parent) for the x pass
        # consumer (parent-grid) extents: DT outputs beyond them are
        # masked to -inf downstream, so the adaptive window kernel may
        # treat them as don't-care and stop scanning early
        ovy = np.where(
            np.arange(w_child)[None, None, :] < vw_sm[:, :, None],
            vh_par[:, None, None],
            0,
        ).astype(np.int32)  # (S, M, W_child): y-pass output extent
        ovx = np.where(
            np.arange(hr_par)[None, None, :] < vh_par[:, None, None],
            vw_par[:, None, None],
            0,
        ).astype(np.int32)  # (S, M, H_parent): x-pass output extent
        return vhp, vwp, ovy, ovx

    def _combine_group(parts: List[int], dt: jax.Array, ptr: jax.Array):
        """Mixture combine for a stacked level group, per parent mixture
        l, via an unrolled first-max-wins where-chain over child
        mixtures k: fused elementwise kernels over the whole (G, S, ...)
        stack — no argmax reduction, no take_along_axis gathers
        (detect_fast.m:134-141 semantics). Callers pass single-part
        groups by default (see the call site for the measured reason);
        G>1 stacking is kept for experimentation. Pointers
        pack (Ik, Iy, Ix) into one int32 (12 bits/coordinate) — one
        table per part instead of three.

        dt/ptr: (G, S, M, Hp, Wp). Returns (msg, tbl): (G, S, L, Hp, Wp).
        """
        if tensors is not None:
            bias_g = jnp.stack([bias_all[p] for p in parts]).astype(dtype)
        else:
            bias_g = jnp.asarray(
                np.stack([bias_all[p] for p in parts]), dtype
            )  # (G, L=M, K=M), -inf padded
        b = bias_g[:, None, :, :, None, None]  # (G, 1, L, K, 1, 1)
        packed = [(jnp.int32(k) << 24) | ptr[:, :, k] for k in range(m_total)]
        msg_l, ptr_l = [], []
        for l in range(m_total):
            best = dt[:, :, 0] + b[:, :, l, 0]
            ptrb = packed[0]
            for k in range(1, m_total):
                val = dt[:, :, k] + b[:, :, l, k]
                pred = val > best
                best = jnp.where(pred, val, best)
                ptrb = jnp.where(pred, packed[k], ptrb)
            msg_l.append(best)
            ptr_l.append(ptrb)
        return jnp.stack(msg_l, axis=2), jnp.stack(ptr_l, axis=2)

    # group parts by tree depth: all parts of a level are independent,
    # so their distance transforms run as ONE batched kernel call per
    # (grid-compatible) group — cutting kernel-launch count ~tree-depth
    # fold vs the reference's per-part sequence
    depth = np.zeros(p_total, dtype=np.int64)
    for p in range(1, p_total):
        depth[p] = depth[int(comp.parentid[p])] + 1
    levels: Dict[int, List[int]] = {}
    for p in range(1, p_total):
        levels.setdefault(int(depth[p]), []).append(p)

    acc: Dict[int, jax.Array] = {}
    tables: Dict[int, Tuple[jax.Array, jax.Array, jax.Array]] = {}

    for lvl in sorted(levels, reverse=True):
        # sub-group by (child grid, parent grid, step): stacked parts
        # must share every static DT parameter
        groups: Dict[tuple, List[int]] = {}
        for p in levels[lvl]:
            par = int(comp.parentid[p])
            key = (int(ds[p]), int(ds[par]), int(comp.step[p]))
            groups.setdefault(key, []).append(p)

        for (_, _, step), parts in groups.items():
            par_grids = [grid_of(int(comp.parentid[p])) for p in parts]
            hr_par, wr_par = par_grids[0]
            scores, vhs_g, vws_g, ovy_g, ovx_g = [], [], [], [], []
            for p in parts:
                sc = part_score(p)
                if p in acc:
                    sc = sc + acc.pop(p)
                scores.append(sc)
                vhp, vwp, ovy, ovx = _valid_counts(
                    p, int(comp.parentid[p]), sc, hr_par
                )
                vhs_g.append(vhp)
                vws_g.append(vwp)
                ovy_g.append(ovy)
                ovx_g.append(ovx)
            g = len(parts)
            score_g = jnp.stack(scores, axis=0)  # (G, S, M, H, W)
            # params shaped (G, 1, M, ...) so they broadcast over the
            # (G, S, M, rows) batch of the stacked transform
            if tensors is not None:
                defw_g = jnp.stack([defw_all[p] for p in parts], axis=0)[
                    :, None
                ]
            else:
                defw_g = jnp.asarray(
                    np.stack([defw_all[p] for p in parts])[:, None], dtype
                )
            sx_g = jnp.asarray(
                np.stack([comp.shift_x[p] for p in parts])[:, None]
            )
            sy_g = jnp.asarray(
                np.stack([comp.shift_y[p] for p in parts])[:, None]
            )
            vh_g = None if vhs_g[0] is None else np.stack(vhs_g)
            vw_g = None if vws_g[0] is None else np.stack(vws_g)
            ovy_gs = None if ovy_g[0] is None else np.stack(ovy_g)
            ovx_gs = None if ovx_g[0] is None else np.stack(ovx_g)

            dt_g, ptr_g = shift_distance_transform_2d_packed(
                score_g,
                defw_g,  # (G, M, 4)
                sx_g,  # (G, M)
                sy_g,
                dlen_x=wr_par,
                dlen_y=hr_par,
                step=step,
                valid_h=vh_g,
                valid_w=vw_g,
                differentiable=tensors is not None,
                out_valid_h=ovy_gs,
                out_valid_w=ovx_gs,
                # deformation params are per (G, M) — the scale axis is
                # packable along VPU lanes (see _use_scale_pack)
                pack_axis=1,
            )

            # per-part combine is the default: stacking the combine over
            # the whole group materializes (G, S, L, Hp, Wp) message +
            # table tensors that downstream per-part slices can't fuse
            # away — measured +8.7 ms/img on v5e with tables live (A/B
            # 2026-08-16); with tables dead the two compile identically.
            import os as _os
            if _os.environ.get("PBD_COMBINE_GROUP", "0") == "1":
                msg_g, tbl_g = _combine_group(parts, dt_g, ptr_g)
                for i, p in enumerate(parts):
                    tables[p] = tbl_g[i]
                    par = int(comp.parentid[p])
                    msg = msg_g[i]
                    acc[par] = msg if par not in acc else acc[par] + msg
            else:
                for i, p in enumerate(parts):
                    msg, tbl = _combine_group(
                        [p], dt_g[i : i + 1], ptr_g[i : i + 1]
                    )
                    tables[p] = tbl[0]
                    par = int(comp.parentid[p])
                    acc[par] = (
                        msg[0] if par not in acc else acc[par] + msg[0]
                    )

    root = part_score(0)
    if 0 in acc:
        root = root + acc.pop(0)
    root = root + jnp.asarray(root_bias, dtype)[None, :, None, None]
    rootv = root[:, 0]
    rooti = jnp.zeros(rootv.shape, jnp.int32)
    for m in range(1, m_total):
        pred = root[:, m] > rootv
        rootv = jnp.where(pred, root[:, m], rootv)
        rooti = jnp.where(pred, m, rooti)
    return rootv, rooti, tables


def backtrack_merged(
    rootvs: List[jax.Array],
    rootis: List[jax.Array],
    tables_list: List[Dict[int, jax.Array]],
    comp: PackedComponent,
    box_scales_list: List[jax.Array],
    box_off_x: int,
    box_off_y: int,
    thresh: float,
    max_det: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Cross-bucket candidate extraction + one level-batched tree walk.

    The per-bucket `backtrack` pays one top_k sort per bucket and P-1
    *serialized* 256-wide gathers per bucket (the round-2 device trace
    attributes ~3 ms of the person26 detect tail to this scalar-core
    chain: ~250 small gathers with SMEM index staging). This variant
    restructures the tail:

      1. ONE global top_k over the flat-concatenated root maps of all
         buckets (replaces NB bucket sorts + the merge sort),
      2. per-candidate bucket/scale/coords recovered by vectorized
         divmod against static per-bucket offsets,
      3. ONE pointer-table gather per tree *level*: every part's
         pointer tables for every bucket ride a single flat
         concatenation, and all parts at a depth d gather together —
         total gathers = tree depth, not NB * (P - 1).

    Requires a homogeneous component (all parts on the root grid:
    ds_total == 0 — callers fall back to `backtrack` otherwise).
    Candidate SET and scores match the per-bucket path exactly; order
    among exactly-tied scores may differ (global flat-index order vs
    per-bucket-then-merge order).

    Same return contract as `backtrack`, over the union of buckets.
    Reference: detect_fast.m:144-177 (same walk semantics).
    """
    nb = len(rootvs)
    p_total = comp.nparts
    m_total = comp.maxmix
    dtype = rootvs[0].dtype
    s_l = [int(rv.shape[0]) for rv in rootvs]
    h_l = [int(rv.shape[1]) for rv in rootvs]
    w_l = [int(rv.shape[2]) for rv in rootvs]
    n_l = [s * h * w for s, h, w in zip(s_l, h_l, w_l)]
    off = np.concatenate([[0], np.cumsum(n_l)]).astype(np.int64)
    ntot = int(off[-1])
    assert (p_total - 1) * m_total * ntot < 2**31 - 1, (
        "flat table index must fit int32"
    )

    flat = jnp.concatenate([rv.reshape(-1) for rv in rootvs])
    k = min(max_det, ntot)
    vals, idx = jax.lax.top_k(flat, k)
    if k < max_det:
        vals = jnp.concatenate(
            [vals, jnp.full(max_det - k, NEG_INF, vals.dtype)]
        )
        idx = jnp.concatenate([idx, jnp.zeros(max_det - k, idx.dtype)])
    valid = vals >= thresh

    bid = jnp.zeros(idx.shape, jnp.int32)
    for b in range(1, nb):
        bid = bid + (idx >= np.int32(off[b])).astype(jnp.int32)
    off_arr = jnp.asarray(off[:nb].astype(np.int32))[bid]  # (K,)
    hc = jnp.asarray(np.asarray(h_l, np.int32))[bid]
    wc = jnp.asarray(np.asarray(w_l, np.int32))[bid]
    local = idx - off_arr
    hw = hc * wc
    si = local // hw
    rem = local % hw
    yi = rem // wc
    xi = rem % wc
    mi = jnp.concatenate([ri.reshape(-1) for ri in rootis])[idx]

    # one flat table buffer: part-major, then bucket-major inside —
    # entry (p, b, s, l, y, x) lives at
    # (p-1)*M*ntot + M*off[b] + ((s*M + l)*Hb + y)*Wb + x
    per_part = m_total * ntot
    t_flat = jnp.concatenate(
        [
            jnp.concatenate(
                [tables_list[b][p].reshape(-1) for b in range(nb)]
            )
            for p in range(1, p_total)
        ]
    )
    t_off = m_total * off_arr  # (K,) int32 bucket base within a part

    depth = np.zeros(p_total, dtype=np.int64)
    for p in range(1, p_total):
        depth[p] = depth[int(comp.parentid[p])] + 1
    levels: Dict[int, List[int]] = {}
    for p in range(1, p_total):
        levels.setdefault(int(depth[p]), []).append(p)

    xs: List[jax.Array] = [None] * p_total
    ys: List[jax.Array] = [None] * p_total
    ms: List[jax.Array] = [None] * p_total
    xs[0], ys[0], ms[0] = xi, yi, mi
    for d in sorted(levels):
        parts = levels[d]
        pidx = np.asarray(parts, np.int64) - 1  # rows into t_flat
        par_x = jnp.stack([xs[int(comp.parentid[p])] for p in parts])
        par_y = jnp.stack([ys[int(comp.parentid[p])] for p in parts])
        par_m = jnp.stack([ms[int(comp.parentid[p])] for p in parts])
        base = jnp.asarray((pidx * per_part).astype(np.int32))[:, None]
        idx_t = (
            base
            + t_off[None, :]
            + ((si[None, :] * m_total + par_m) * hc[None, :] + par_y)
            * wc[None, :]
            + par_x
        )  # (G, K)
        ptr = t_flat[idx_t]
        for g, p in enumerate(parts):
            xs[p] = ptr[g] & 0xFFF
            ys[p] = (ptr[g] >> 12) & 0xFFF
            ms[p] = ptr[g] >> 24

    soff = np.concatenate([[0], np.cumsum(s_l)]).astype(np.int32)
    bsc_flat = jnp.concatenate(
        [jnp.asarray(b_, dtype) for b_ in box_scales_list]
    )
    root_scale = bsc_flat[jnp.asarray(soff[:nb])[bid] + si]  # (K,)

    xs_t = jnp.stack(xs)  # (P, K)
    ys_t = jnp.stack(ys)
    ms_t = jnp.stack(ms)
    fsize = jnp.asarray(comp.fsize)  # (P, M, 2)
    sz = fsize[
        jnp.arange(p_total, dtype=jnp.int32)[:, None], ms_t
    ]  # (P, K, 2)
    sc_b = root_scale[None, :]  # ds_total == 0: one grid for all parts
    x1 = (xs_t.astype(dtype) + box_off_x) * sc_b
    y1 = (ys_t.astype(dtype) + box_off_y) * sc_b
    x2 = x1 + sz[..., 1].astype(dtype) * sc_b - 1
    y2 = y1 + sz[..., 0].astype(dtype) * sc_b - 1
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)  # (P, K, 4)
    boxes = jnp.swapaxes(boxes, 0, 1)  # (K, P, 4)
    mixtures = jnp.swapaxes(ms_t, 0, 1).astype(jnp.int32)
    coords = (
        bid,
        si.astype(jnp.int32),
        jnp.swapaxes(xs_t, 0, 1).astype(jnp.int32),
        jnp.swapaxes(ys_t, 0, 1).astype(jnp.int32),
    )
    return boxes, vals, mixtures, valid, coords


def backtrack(
    rootv: jax.Array,
    rooti: jax.Array,
    tables: Dict[int, Tuple[jax.Array, jax.Array, jax.Array]],
    comp: PackedComponent,
    box_scales: jax.Array,  # (S,) image-pixels-per-cell per scale
    box_off_x: int,
    box_off_y: int,
    thresh: float,
    max_det: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Extract up to max_det candidates and walk the tree for part boxes.

    Returns (boxes (max_det, P, 4) [x1,y1,x2,y2] in image coords,
    scores (max_det,), mixtures (max_det, P) int32, valid (max_det,)).
    Box geometry follows detect_fast.m:170-175 (0-based):
    x1 = (x - padx) * scale, x2 = x1 + sizx*scale - 1.
    """
    s, hr, wr = rootv.shape
    p_total = comp.nparts
    flat = rootv.reshape(-1)
    k = min(max_det, flat.shape[0])
    vals, idx = jax.lax.top_k(flat, k)
    if k < max_det:  # pad to the static budget
        vals = jnp.concatenate([vals, jnp.full(max_det - k, NEG_INF, vals.dtype)])
        idx = jnp.concatenate([idx, jnp.zeros(max_det - k, idx.dtype)])
    valid = vals >= thresh

    si = idx // (hr * wr)
    rem = idx % (hr * wr)
    yi = rem // wr
    xi = rem % wr
    mi = rooti.reshape(-1)[idx]

    xs: List[jax.Array] = [None] * p_total
    ys: List[jax.Array] = [None] * p_total
    ms: List[jax.Array] = [None] * p_total
    xs[0], ys[0], ms[0] = xi, yi, mi
    for p in range(1, p_total):
        par = int(comp.parentid[p])
        ptr = tables[p][si, ms[par], ys[par], xs[par]]
        xs[p] = ptr & 0xFFF
        ys[p] = (ptr >> 12) & 0xFFF
        ms[p] = ptr >> 24

    root_scale = box_scales[si].astype(rootv.dtype)  # (max_det,)
    ds = (
        np.asarray(comp.ds_total)
        if comp.ds_total is not None
        else np.zeros(p_total, dtype=np.int64)
    )
    fsize = jnp.asarray(comp.fsize)  # (P, M, 2)
    boxes = []
    for p in range(p_total):
        # a part d octaves below the root lives on a 2^d finer grid
        scale = root_scale / float(1 << int(ds[p]))
        sz = fsize[p][ms[p]]  # (max_det, 2) = (fh, fw)
        x1 = (xs[p].astype(rootv.dtype) + box_off_x) * scale
        y1 = (ys[p].astype(rootv.dtype) + box_off_y) * scale
        x2 = x1 + sz[:, 1].astype(rootv.dtype) * scale - 1
        y2 = y1 + sz[:, 0].astype(rootv.dtype) * scale - 1
        boxes.append(jnp.stack([x1, y1, x2, y2], axis=-1))
    boxes = jnp.stack(boxes, axis=1)  # (max_det, P, 4)
    mixtures = jnp.stack(ms, axis=1).astype(jnp.int32)
    coords = (
        si.astype(jnp.int32),
        jnp.stack(xs, axis=1).astype(jnp.int32),
        jnp.stack(ys, axis=1).astype(jnp.int32),
    )
    return boxes, vals, mixtures, valid, coords
