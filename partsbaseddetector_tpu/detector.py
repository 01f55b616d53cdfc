"""PartsBasedDetector: the public detect() API.

API parity with the reference detector
(include/PartsBasedDetector.hpp:167-175): construct, distribute_model(),
name(), detect(image[, depth]) -> candidates. Internally, one jitted
function per image shape runs the whole pipeline on device:

    HOG pyramid (matmul resampling + conv histograms)
      -> batched part-filter responses per octave bucket
      -> -inf valid-extent masking
      -> tree min-sum DP (batched DT + mixture max)
      -> top-k thresholded backtracking

Only final dense candidate tensors leave the device. Compilation is
cached per (model, image-shape, engine).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.model import Model, PackedModel, pack_model
from .ops.dp import backtrack, backtrack_merged
from .pipeline import make_plan, root_scores
from .types import Candidate, DetectionResult

NEG_INF = -jnp.inf


def _wire_image(im, dtype) -> np.ndarray:
    """Host-side wire narrowing for images — THE single source of the
    wire-format policy: uint8 frames (the camera/reference demo format,
    src/demo.cpp:90-99) travel as uint8 — 4x fewer bytes than host-side
    float conversion — and are cast to the compute dtype ON DEVICE
    (pipeline.root_scores casts at program entry, so the uint8 program
    is value-identical to the float one); float frames travel at the
    detector's wire dtype."""
    im = np.asarray(im)
    if im.dtype == np.uint8:
        return im
    return im.astype(np.dtype(dtype), copy=False)


def _wire_depth(depth) -> np.ndarray:
    """Host-side wire narrowing for depth maps: uint16 frames are
    Kinect-native millimeters (the reference demo reads exactly this
    and divides by 1000, src/demo.cpp:95-99; the ROS node's 16UC1 path
    is the same) — they travel as uint16 (4x fewer bytes than f32
    meters) and convert to f32 meters ON DEVICE; floats travel as f32
    meters."""
    depth = np.asarray(depth)
    if depth.dtype == np.uint16:
        return depth
    return depth.astype(np.float32, copy=False)


def _upload(im: np.ndarray, dtype) -> jax.Array:
    """device_put an image in its narrowest exact wire format
    (_wire_image). On a tunneled accelerator the per-frame wire
    transfer is a first-order serving cost; jax.device_put is used
    instead of jnp.asarray — asarray's blocking transfer measured 2-3x
    slower inside a dispatch pipeline."""
    return jax.device_put(_wire_image(im, dtype))


def _upload_depth(depth: np.ndarray) -> jax.Array:
    """device_put a depth map in its narrowest exact wire format
    (_wire_depth)."""
    return jax.device_put(_wire_depth(depth))


def _upload_pair(im, dtype, depth) -> tuple:
    """ONE fused device_put for an (rgb, depth) pair — two separate
    calls pay two tunnel round trips (measured 7.9 vs 1.8 ms;
    tools/upload_probe.py)."""
    return jax.device_put((_wire_image(im, dtype), _wire_depth(depth)))


def _depth_meters_host(depth: np.ndarray) -> np.ndarray:
    """Host-side twin of the device conversion (for the host filter)."""
    depth = np.asarray(depth)
    if depth.dtype == np.uint16:
        return depth.astype(np.float32) / 1000.0
    return depth


class PartsBasedDetector:
    """TPU-native flexible-mixtures-of-parts detector.

    Args:
      model: canonical Model (optional; call distribute_model later).
      max_detections: static per-image candidate budget.
      conv_engine: "spatial" (batched XLA conv) or "fourier" (FFT path,
          the intended FourierConvolutionEngine behavior).
      dtype: compute dtype (float32 for reference parity).
    """

    def __init__(
        self,
        model: Optional[Model] = None,
        max_detections: int = 256,
        conv_engine: str = "spatial",
        dtype=jnp.float32,
        nms_overlap: Optional[float] = None,
        border_mode: str = "matlab",
        buckets_per_octave: int = 1,
        depth_gate=None,
        device_depth_filter: bool = False,
        rerank_fp32: Optional[bool] = None,
    ):
        if conv_engine not in ("spatial", "fourier"):
            raise ValueError(f"unknown conv engine: {conv_engine}")
        # hybrid-precision serving: run the pipeline in `dtype` (bf16 for
        # the fast profile), then re-score the top-k placements and
        # rebuild their boxes in fp32 on device (ops/rescore.py) — the
        # score-reconstruction identity of detect.m:141-146 as a serving
        # stage. Defaults on whenever dtype is not float32.
        if rerank_fp32 is None:
            rerank_fp32 = jnp.dtype(dtype) != jnp.float32
        self.rerank_fp32 = bool(rerank_fp32)
        # float frames must reach the device at full precision when the
        # re-rank will read them in fp32 (uint8 wire frames are exact
        # either way; root_scores casts to the compute dtype on device)
        self.wire_dtype = jnp.float32 if self.rerank_fp32 else dtype
        # plausible-depth response pruning (depth.DepthGate): when set
        # and detect() receives a depth map, per-scale implausible
        # response cells are -inf-masked ON DEVICE before the DP — the
        # intended SearchSpacePruning::filterResponseByDepth
        # (src/SearchSpacePruning.cpp:47-70 computes and discards)
        self.depth_gate = depth_gate
        # run the candidate depth-consistency filter ON DEVICE inside
        # the jitted program (ops/depth_device.py): the serving path for
        # RGB-D streams — the host applies a precomputed keep mask and
        # never touches the depth map (the host path in depth.py is the
        # exact reference implementation and stays the default; device
        # medians are exact for part boxes up to 48 px and
        # strided-sampled beyond)
        self.device_depth_filter = bool(device_depth_filter)
        self.max_detections = int(max_detections)
        self.conv_engine = conv_engine
        self.dtype = dtype
        # "matlab" (authoritative) or "cpp" (the C++ demo's same-size
        # grids, one-padded borders, and one-cell box offset)
        self.border_mode = border_mode
        # >1 trades program count for less bucket-padding waste
        self.buckets_per_octave = int(buckets_per_octave)
        # optional on-device part-aware NMS (detection/nms.m) applied to
        # the final candidate set before it leaves the chip
        self.nms_overlap = nms_overlap
        self._packed: Optional[PackedModel] = None
        self._fns: Dict[Tuple[int, int], object] = {}
        if model is not None:
            self.distribute_model(model)

    # -- reference API surface ------------------------------------------------

    def distribute_model(self, model: Model) -> None:
        """Pack the model into dense device form and reset caches
        (ref: src/PartsBasedDetector.cpp:102-127)."""
        self._packed = pack_model(model, border=self.border_mode)
        self._fns.clear()

    @property
    def name(self) -> str:
        return self._packed.name if self._packed else ""

    def detect(
        self, im: np.ndarray, depth: Optional[np.ndarray] = None
    ) -> List[Candidate]:
        """Detect candidates in an (H, W, 3) image, best first.

        If a depth map is given, candidates are additionally filtered for
        part depth consistency (ref: SearchSpacePruning; see depth.py),
        and — when the detector was constructed with a depth_gate —
        per-scale implausible-depth response cells are pruned on device
        before the DP (the intended filterResponseByDepth).
        """
        result = self.detect_dense(im, depth)
        if depth is not None and result.depth_keep is not None:
            # the jitted program already evaluated the consistency
            # filter; apply its keep mask before candidate assembly
            result.valid = result.valid & result.depth_keep
            return result.to_candidates()
        candidates = result.to_candidates()
        if depth is not None:
            from .depth import filter_candidates_by_depth

            candidates = filter_candidates_by_depth(
                self._packed, candidates, _depth_meters_host(depth)
            )
        return candidates

    # -- dense device API ------------------------------------------------------

    def detect_dense(
        self, im: np.ndarray, depth: Optional[np.ndarray] = None
    ) -> DetectionResult:
        """Run detection, returning dense padded arrays (host copies).

        depth is consumed here only when a depth_gate is configured
        (response pruning happens inside the jitted program); the
        candidate-level depth filter stays in detect()."""
        from .utils.profiling import validate_image

        im = validate_image(im, min_side=5 * self._packed.spec.sbin)
        with_depth = depth is not None and (
            self.depth_gate is not None or self.device_depth_filter
        )
        fn = self._get_fn(im.shape[:2], gated=with_depth)
        if with_depth:
            im_dev, d_dev = _upload_pair(im, self.wire_dtype, depth)
            out = fn(im_dev, d_dev)
        else:
            out = fn(_upload(im, self.wire_dtype))
        # one pipelined device->host gather (device_get starts every
        # leaf's copy before waiting) instead of five serial reads —
        # on a tunneled backend each serial read pays a full RTT
        host = jax.device_get(out)
        boxes, scores, comps, valid, mixtures = host[:5]
        return DetectionResult(
            boxes=boxes,
            scores=scores,
            components=comps,
            valid=valid,
            nparts_by_component=[c.nparts for c in self._packed.components],
            mixtures=mixtures,
            depth_keep=host[5] if len(host) > 5 else None,
        )

    def detect_stream(
        self,
        frames,
        lookahead: int = 2,
        workers: int = 1,
        readback_batch: int = 1,
    ):
        """Pipelined streaming serving: yields List[Candidate] per frame.

        frames: iterable of rgb or (rgb, depth) pairs. Keeps up to
        `lookahead` jitted programs in flight so host->device copies,
        device compute, and host post-processing (depth-consistency
        filtering, candidate assembly) overlap. The synchronous
        `detect()` serializes transfer -> compute -> readback per call,
        which on a tunneled/remote accelerator leaves the chip idle for
        most of the wall clock; this is the ROS-node-shaped serving loop
        done right (ref: ros/Node.cpp:144-249 processes frames
        sequentially on CPU where that cost model is fine).

        workers=1 (default) runs readback + host post-processing on a
        worker thread so they overlap the next frames' upload/dispatch;
        workers=N uses N threads (chunks process concurrently, FIFO
        future consumption keeps output order); workers=0 runs them
        inline. readback_batch groups that many
        frames per device_get: on the tunneled backend one
        dispatch+readback round trip costs ~30 ms *regardless of size*
        (1 KB and 10 KB payloads measure the same; tools/stream_probe),
        so reading k frames per call amortizes the RTT k-fold at the
        cost of k-1 frames of extra latency for the earliest frame in
        each group. readback_batch>1 raises the effective lookahead to
        2k so a full chunk can form while another reads back — each
        in-flight program holds device workspace, so memory-constrained
        callers should size readback_batch accordingly; with the
        default readback_batch=1 the caller's lookahead (including 0 =
        fully synchronous) is honored exactly. Output order is
        preserved in every mode."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from .utils.profiling import validate_image

        pend = deque()  # futures (workers>0) or raw chunks, each = k frames
        buf = []  # (out, depth) pairs not yet grouped into a chunk
        ready = deque()  # per-frame results popped from finished chunks

        def finish_chunk(payload):
            # ONE packed wire transfer for the whole chunk: the tunnel
            # pays a ~30 ms round trip per device read regardless of
            # payload, so the chunk's outputs were concatenated into a
            # single (k, M) f32 buffer on device at flush time
            # (_packer); here a single np.asarray brings it back
            packed_buf, depths, wk = payload
            return self._rows_to_candidates(
                np.asarray(packed_buf), depths, wk
            )

        pool = ThreadPoolExecutor(max_workers=workers) if workers else None

        def flush_buf():
            if buf:
                chunk = list(buf)
                buf.clear()
                outs = [o for o, _ in chunk]
                # arity is homogeneous within a chunk: the append path
                # flushes before mixing 5-leaf (no device keep mask)
                # and 6-leaf (gated) outputs in one buffer
                wk = len(outs[0]) > 5
                payload = (
                    self._packer(len(outs), wk)(outs),
                    [d for _, d in chunk],
                    wk,
                )
                pend.append(
                    (
                        len(chunk),
                        pool.submit(finish_chunk, payload)
                        if pool
                        else payload,
                    )
                )

        def pop_chunk():
            n, payload = pend.popleft()
            return payload.result() if pool else finish_chunk(payload)

        def in_flight():
            return len(buf) + sum(n for n, _ in pend)

        # a full chunk must be able to form while another is reading
        # back, else chunking degenerates to partial flushes; with the
        # default readback_batch=1 the caller's lookahead (incl. 0) is
        # honored exactly
        if readback_batch > 1:
            lookahead = max(lookahead, 2 * readback_batch)
        try:
            for frame in frames:
                rgb, depth = (
                    frame if isinstance(frame, tuple) else (frame, None)
                )
                im = validate_image(
                    rgb, min_side=5 * self._packed.spec.sbin
                )
                with_depth = depth is not None and (
                    self.depth_gate is not None or self.device_depth_filter
                )
                fn = self._get_fn(im.shape[:2], gated=with_depth)
                if with_depth:
                    im_dev, d_dev = _upload_pair(
                        im, self.wire_dtype, depth
                    )
                    out = fn(im_dev, d_dev)
                else:
                    out = fn(_upload(im, self.wire_dtype))
                if buf and len(buf[-1][0]) != len(out):
                    # keep chunks arity-homogeneous: a stream mixing
                    # gated (6-leaf) and plain (5-leaf) frames packs
                    # them in separate chunks (the packer concatenates
                    # a fixed leaf set per buffer)
                    flush_buf()
                buf.append((out, depth))
                if len(buf) >= readback_batch:
                    flush_buf()
                while in_flight() > lookahead:
                    if not pend:
                        flush_buf()
                    ready.extend(pop_chunk())
                while ready:
                    yield ready.popleft()
            flush_buf()
            while pend:
                ready.extend(pop_chunk())
            while ready:
                yield ready.popleft()
        finally:
            if pool:
                pool.shutdown(wait=False)

    # -- packed readback -------------------------------------------------------

    def _packer(
        self, k: int, with_keep: bool = False, top: Optional[int] = None
    ):
        """Jitted on-device output packer: k detection-output tuples ->
        ONE (k, M) float32 buffer. The tunneled backend pays a
        per-device_get round trip (~30 ms measured, payload-size
        independent for these sizes; tools/upload_probe.py), so reading
        five small leaves per frame dominates fresh-frame serving wall
        clock. Packing k frames' outputs into a single array on device
        (bitcasting int leaves to f32 — exact) makes the readback ONE
        transfer per k frames. top (optional) additionally truncates
        each frame to its best `top` candidates before packing (outputs
        are score-sorted on device): the down-wire shares the same
        ~36 MB/s serialized tunnel as the uploads, so a 256-candidate
        frame's 136 KB payload costs ~3.8 ms of wire — top=64 cuts it
        4x for throughput serving. Host-side unpack is numpy slicing
        (_unpack_host)."""
        top = self._norm_top(top)
        key = ("pack", int(k), bool(with_keep), top)
        if key not in self._fns:

            def pack1(o):
                if top is not None:
                    # valid rows must form a prefix before truncation:
                    # thresholded top_k output is already score-sorted
                    # with valid as a prefix, but device NMS suppresses
                    # rows IN PLACE (valid=False interleaved), so slice
                    # [:top] would drop valid candidates ranked below
                    # suppressed ones. A stable partition by ~valid
                    # keeps valid rows first in score order.
                    valid = o[3]
                    order = jnp.argsort(
                        (~valid).astype(jnp.int32), stable=True
                    )
                    o = tuple(x[order] for x in o)
                    o = tuple(x[:top] for x in o)
                parts = [
                    o[0].reshape(-1).astype(jnp.float32),  # boxes
                    o[1].astype(jnp.float32),  # scores
                    jax.lax.bitcast_convert_type(
                        o[2].astype(jnp.int32), jnp.float32
                    ),  # components
                    o[3].astype(jnp.float32),  # valid
                    jax.lax.bitcast_convert_type(
                        o[4].astype(jnp.int32), jnp.float32
                    ).reshape(-1),  # mixtures
                ]
                if with_keep:
                    parts.append(o[5].astype(jnp.float32))
                return jnp.concatenate(parts)

            self._fns[key] = jax.jit(
                lambda outs: jnp.stack([pack1(o) for o in outs])
            )
        return self._fns[key]

    def _rows_to_candidates(
        self,
        host: np.ndarray,
        depths,
        wk: bool = False,
        top: Optional[int] = None,
    ) -> List[List[Candidate]]:
        """Shared packed-row assembly: unpack each frame's row, apply
        the device keep mask (gated programs) or the host depth filter
        (ungated frames that carried a depth map), and build the
        candidate lists. depths: per-frame depth map or None."""
        nbc = [c.nparts for c in self._packed.components]
        results: List[List[Candidate]] = []
        for j, depth in enumerate(depths):
            bx, sc, cp, vd, mx, keep = self._unpack_host(
                host[j], wk, top
            )
            if keep is not None:
                # device-side depth-consistency filter: apply the
                # precomputed keep mask; no host depth pass
                vd = vd & keep
            cands = DetectionResult(
                boxes=bx,
                scores=sc,
                components=cp,
                valid=vd,
                nparts_by_component=nbc,
                mixtures=mx,
            ).to_candidates()
            if depth is not None and not wk:
                from .depth import filter_candidates_by_depth

                cands = filter_candidates_by_depth(
                    self._packed, cands, _depth_meters_host(depth)
                )
            results.append(cands)
        return results

    def _norm_top(self, top: Optional[int]) -> Optional[int]:
        """Clamp a readback truncation to the program's candidate
        budget; asking for >= max_detections is the full readback
        (slicing beyond D would silently shrink the packed rows and
        desync _unpack_host's offsets)."""
        if top is None:
            return None
        top = int(top)
        if top <= 0:
            raise ValueError(
                f"readback_top must be positive, got {top}"
            )
        top = min(top, self.max_detections)
        return None if top == self.max_detections else top

    def _unpack_host(
        self,
        row: np.ndarray,
        with_keep: bool = False,
        top: Optional[int] = None,
    ):
        """Inverse of _packer for one frame's packed row."""
        top = self._norm_top(top)
        d = self.max_detections if top is None else top
        p = self._packed.max_nparts
        nb, ns = d * p * 4, d
        off = 0
        bx = row[off : off + nb].reshape(d, p, 4)
        off += nb
        sc = row[off : off + ns]
        off += ns
        cp = row[off : off + ns].view(np.int32)
        off += ns
        vd = row[off : off + ns] != 0.0
        off += ns
        mx = row[off : off + d * p].view(np.int32).reshape(d, p)
        off += d * p
        keep = None
        if with_keep:
            keep = row[off : off + ns] != 0.0
        return bx, sc, cp, vd, mx, keep

    def detect_batch(self, images) -> List[List[Candidate]]:
        """Throughput API: dispatch every image asynchronously through
        the jitted pipeline and synchronize once — per-image host
        round-trips never serialize the chip. Same-shape images reuse
        one compiled program."""
        outs = []
        for im in images:
            from .utils.profiling import validate_image

            imv = validate_image(im, min_side=5 * self._packed.spec.sbin)
            fn = self._get_fn(imv.shape[:2])
            outs.append(fn(_upload(imv, self.wire_dtype)))
        # packed readback: each device_get/np.asarray round trip on the
        # tunneled backend costs ~30 ms regardless of payload, so the
        # per-frame 5-leaf output tuples are concatenated ON DEVICE into
        # one (k, M) f32 buffer per group of PACK frames — one wire
        # transfer per group instead of five per frame (tools/
        # upload_probe.py, readback section). Exact: int leaves travel
        # bitcast, bools as 0/1 floats.
        PACK = 8
        results: List[List[Candidate]] = []
        packer = self._packer(PACK)
        groups = []
        for i in range(0, len(outs), PACK):
            chunk = outs[i : i + PACK]
            if len(chunk) == PACK:
                groups.append((packer(chunk), PACK))
            else:
                groups.append(
                    (self._packer(len(chunk))(chunk), len(chunk))
                )
        for buf, n in groups:
            results.extend(
                self._rows_to_candidates(np.asarray(buf), [None] * n)
            )
        return results

    def detect_batch_fn(self, imsize: Tuple[int, int], batch: int):
        """Fused batched program: ONE jitted vmap of the full pipeline
        over a (batch, H, W, 3) stack — shared bucket plans, batched
        Pallas DT grids, one top-k per image. This is the
        batched-throughput serving path (BASELINE config 4); the batch
        size is bounded by HBM (the bucket-0 response stack is
        ~0.7 GB/image for person-VGA), so large request batches stream
        through microbatches of this program (see detect_many)."""
        key = ("batch", int(imsize[0]), int(imsize[1]), int(batch))
        if key not in self._fns:
            single = self._build_fn((int(imsize[0]), int(imsize[1])))
            spectra = getattr(single, "_fft_spectra", None)
            if spectra is not None:
                # fourier: spectra as runtime args, broadcast over batch
                sp_dev = jax.device_put(
                    [jnp.asarray(s) for s in spectra]
                )
                jfn = jax.jit(
                    jax.vmap(
                        lambda im, sp: single(im, None, sp),
                        in_axes=(0, None),
                    )
                )
                self._fns[key] = (
                    lambda ims, _jfn=jfn, _sp=sp_dev: _jfn(ims, _sp)
                )
            else:
                self._fns[key] = jax.jit(jax.vmap(single))
        return self._fns[key]

    def detect_many(
        self,
        images,
        microbatch: int = 1,
        readback_top: Optional[int] = None,
        prefetch: int = 0,
    ) -> List[List[Candidate]]:
        """High-throughput batch API: streams the request list through
        the chip with async dispatch and one pipelined sync.

        microbatch=1 (default) dispatches the single-image program per
        image — measured fastest on one chip (43.4 img/s vs 39.9 for
        the fused vmap at micro=8, tools/batch64_probe.py): the
        single-image program already keeps the chip ~95%+ occupied, so
        vmap only adds batched-gather glue (~2 ms/img). microbatch>1
        compiles a fused vmap program instead — useful when the model
        is small enough that per-image dispatch can't fill the chip.

        readback_top (optional): truncate each frame's readback to its
        best `readback_top` candidates (score order is preserved) — on
        the tunneled backend up- and down-wire share one ~36 MB/s
        serialized channel, so the full 256-candidate payload costs
        ~4 ms/frame of wire; top-64 makes fresh-frame serving
        upload-bound (the theoretical wire ceiling). prefetch>0
        additionally runs uploads on a worker thread `prefetch` frames
        ahead of dispatch so the host-side upload serialization
        overlaps the compute queue (micro=1 only)."""
        from .utils.profiling import validate_image

        if len(images) == 0:
            return []
        if microbatch == 1:
            if prefetch > 0 or readback_top is not None:
                return self._detect_many_pipelined(
                    images, readback_top, max(prefetch, 1)
                )
            return self.detect_batch(images)
        if prefetch > 0 or readback_top is not None:
            raise ValueError(
                "readback_top/prefetch belong to the microbatch=1 "
                "pipelined path; the fused-vmap path (microbatch>1) "
                "reads full batched outputs"
            )
        imgs = [
            validate_image(im, min_side=5 * self._packed.spec.sbin)
            for im in images
        ]
        shape = imgs[0].shape[:2]
        assert all(im.shape[:2] == shape for im in imgs), (
            "detect_many requires same-shape images; mixed shapes go "
            "through detect_batch (one program per shape)"
        )
        n = len(imgs)
        pad = (-n) % microbatch
        if pad:
            imgs += [imgs[-1]] * pad
        fn = self.detect_batch_fn(shape, microbatch)
        outs = []
        for i in range(0, len(imgs), microbatch):
            chunk = _upload(np.stack(imgs[i : i + microbatch]), self.wire_dtype)
            outs.append(fn(chunk))  # async dispatch, no host sync
        outs = jax.device_get(outs)  # one pipelined readback (see detect_batch)
        nbc = [c.nparts for c in self._packed.components]
        results: List[List[Candidate]] = []
        for out in outs:
            boxes, scores, comps, valid, mix = out
            for j in range(boxes.shape[0]):
                if len(results) == n:
                    break
                results.append(
                    DetectionResult(
                        boxes=boxes[j],
                        scores=scores[j],
                        components=comps[j],
                        valid=valid[j],
                        nparts_by_component=nbc,
                        mixtures=mix[j],
                    ).to_candidates()
                )
        return results

    def _detect_many_pipelined(
        self, images, readback_top: Optional[int], prefetch: int
    ) -> List[List[Candidate]]:
        """micro=1 serving loop tuned for the tunneled backend: ONE
        uploader thread (parallel streams do not scale the channel —
        measured 25.5/24.7/26.4 ms/frame for 1/2/4 streams,
        tools/upload_probe.py) keeps `prefetch` uploads in flight ahead
        of dispatch, outputs pack on device in groups of 8 (optionally
        truncated to readback_top), and each group returns in one wire
        transfer."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from .utils.profiling import validate_image

        imgs = [
            validate_image(im, min_side=5 * self._packed.spec.sbin)
            for im in images
        ]
        fn = self._get_fn(imgs[0].shape[:2])
        if any(im.shape[:2] != imgs[0].shape[:2] for im in imgs):
            raise ValueError(
                "detect_many's pipelined path requires same-shape "
                "images (one compiled plan); mixed shapes go through "
                "detect_batch (one program per shape)"
            )
        PACK = 8
        packer = self._packer(PACK, top=readback_top)
        pool = ThreadPoolExecutor(max_workers=1)
        futs: deque = deque()
        idx = 0
        n = len(imgs)
        outs: List = []
        bufs: List[Tuple[object, int]] = []
        try:
            for _ in range(min(prefetch, n)):
                futs.append(
                    pool.submit(_upload, imgs[idx], self.wire_dtype)
                )
                idx += 1
            while futs:
                x = futs.popleft().result()
                outs.append(fn(x))
                if idx < n:
                    futs.append(
                        pool.submit(_upload, imgs[idx], self.wire_dtype)
                    )
                    idx += 1
                if len(outs) == PACK:
                    bufs.append((packer(outs), PACK))
                    outs = []
            if outs:
                bufs.append(
                    (
                        self._packer(len(outs), top=readback_top)(outs),
                        len(outs),
                    )
                )
        finally:
            pool.shutdown(wait=False)
        results: List[List[Candidate]] = []
        for buf, k in bufs:
            results.extend(
                self._rows_to_candidates(
                    np.asarray(buf), [None] * k, top=readback_top
                )
            )
        return results

    def detect_fn(self, imsize: Tuple[int, int]):
        """The raw jitted function for an image shape; returns
        (boxes, scores, components, valid, mixtures). Useful for vmap /
        shard_map composition (see parallel/)."""
        return self._get_fn(imsize)

    # -- internals --------------------------------------------------------------

    def _get_fn(self, imsize: Tuple[int, int], gated: bool = False):
        if self._packed is None:
            raise RuntimeError("distribute_model() must be called first")
        key = (int(imsize[0]), int(imsize[1]), bool(gated))
        if key not in self._fns:
            raw = self._build_fn(key[:2], gated)
            jfn = jax.jit(raw)
            spectra = getattr(raw, "_fft_spectra", None)
            if spectra is not None:
                # fourier serving: device-resident spectra passed as
                # runtime args on every call (constants would overflow
                # remote-compile payload limits at person26 scale)
                sp_dev = jax.device_put(
                    [jnp.asarray(s) for s in spectra]
                )

                def wrapped(
                    im, depth=None, _jfn=jfn, _sp=sp_dev
                ):
                    return _jfn(im, depth, _sp)

                self._fns[key] = wrapped
            else:
                self._fns[key] = jfn
        return self._fns[key]

    def _build_fn(self, imsize: Tuple[int, int], gated: bool = False):
        packed = self._packed
        spec = packed.spec
        plan = make_plan(packed, imsize, self.buckets_per_octave)
        max_det = self.max_detections
        p_max = packed.max_nparts
        gate = self.depth_gate if gated else None
        dev_filter = self.device_depth_filter and gated
        if dev_filter:
            from .ops.depth_device import component_tables

            parent_tbl, norm_tbl = component_tables(packed)
        rerank = self.rerank_fp32
        if rerank:
            from .ops.rescore import build_rescore_tables

            rtables = build_rescore_tables(
                packed, plan, self.buckets_per_octave
            )
        fft_sp = None
        if self.conv_engine == "fourier":
            # spectra travel as runtime args (threaded by _get_fn), not
            # baked constants: person26-scale baked spectra overflow the
            # axon remote-compile payload limit (HTTP 413)
            from .pipeline import fourier_spectra_args

            fft_sp = fourier_spectra_args(packed, plan)

        def fn(
            im: jax.Array,
            depth: Optional[jax.Array] = None,
            fft_spectra: Optional[list] = None,
        ):
            import os as _os

            if depth is not None:
                # uint16 wire frames are Kinect millimeters; the
                # reference demo divides by 1000 (src/demo.cpp:95-99)
                depth = (
                    depth.astype(self.dtype) / 1000.0
                    if depth.dtype == jnp.uint16
                    else depth.astype(self.dtype)
                )
            rmasks = None
            if gate is not None:
                from .pipeline import depth_response_masks

                rmasks = depth_response_masks(
                    depth, plan, spec, gate, self.dtype
                )
            # hybrid-precision structure: HOG + conv run in fp32 (they
            # are MXU/compute-bound — fp32 conv costs ~3 ms more than
            # bf16 at person26-VGA), the HBM-bound DT/DP runs in
            # `dtype`, and the fp32 re-score reconstructs exact f32
            # scores by gathering ONE response scalar per (candidate,
            # part) from the fp32 responses (ops/rescore.py — the
            # feature-patch gather formulation measured ~40 ms/img).
            resps32: Optional[list] = [] if rerank else None
            scores = root_scores(
                im, packed, plan, engine=self.conv_engine, dtype=self.dtype,
                response_masks=rmasks,
                conv_dtype=jnp.float32 if rerank else None,
                collect_responses=resps32,
                fft_spectra=fft_spectra,
            )
            boxes_l, scores_l, mix_l, valid_l, comp_l = [], [], [], [], []
            bid_l, si_l, xs_l, ys_l = [], [], [], []

            def keep_coords(bid, si, xs, ys, pc):
                # pad part axis to p_max; padded parts are killed by the
                # rescore partmask (and replicate the root box there)
                if pc < p_max:
                    xs = jnp.pad(xs, ((0, 0), (0, p_max - pc)))
                    ys = jnp.pad(ys, ((0, 0), (0, p_max - pc)))
                bid_l.append(bid)
                si_l.append(si)
                xs_l.append(xs)
                ys_l.append(ys)
            # merged tail: one global top_k + one level-batched walk
            # across ALL buckets of a component (vs NB sorts + NB*(P-1)
            # serialized gathers) — see ops/dp.py::backtrack_merged.
            # Octave-offset components (parts on finer grids) keep the
            # per-bucket walk.
            merged_ok = _os.environ.get("PBD_BACKTRACK", "merged") == "merged"
            by_comp: dict = {}
            if merged_ok:
                for bs in scores:
                    by_comp.setdefault(bs.component, []).append(bs)
            off_x = -1 if spec.border == "cpp" else -spec.padx
            off_y = -1 if spec.border == "cpp" else -spec.pady
            merged_cids = [
                c
                for c, lst in sorted(by_comp.items())
                if packed.components[c].max_ds == 0
            ]
            for c in merged_cids:
                lst = sorted(by_comp[c], key=lambda bs: bs.bucket_index)
                comp = packed.components[c]
                bscales = [
                    jnp.asarray(
                        [
                            plan.scales[s].box_scale
                            for s in plan.buckets[bs.bucket_index].scale_indices
                        ],
                        self.dtype,
                    )
                    for bs in lst
                ]
                bx, sc, mx, vd, coords = backtrack_merged(
                    [bs.rootv for bs in lst],
                    [bs.rooti for bs in lst],
                    [bs.tables for bs in lst],
                    comp,
                    bscales,
                    box_off_x=off_x,
                    box_off_y=off_y,
                    thresh=spec.thresh,
                    max_det=max_det,
                )
                if rerank:
                    # coords[0] indexes the component's bucket list;
                    # map to the global plan bucket index
                    bmap = jnp.asarray(
                        [bs.bucket_index for bs in lst], jnp.int32
                    )
                    keep_coords(
                        bmap[coords[0]], coords[1], coords[2], coords[3],
                        comp.nparts,
                    )
                pc = comp.nparts
                if pc < p_max:
                    rep = jnp.broadcast_to(
                        bx[:, :1], (bx.shape[0], p_max - pc, 4)
                    )
                    bx = jnp.concatenate([bx, rep], axis=1)
                    mx = jnp.pad(mx, ((0, 0), (0, p_max - pc)))
                boxes_l.append(bx)
                scores_l.append(sc)
                mix_l.append(mx)
                valid_l.append(vd)
                comp_l.append(jnp.full(sc.shape, c, jnp.int32))
            scores = [
                bs for bs in scores if bs.component not in merged_cids
            ]
            for bs in scores:
                bucket = plan.buckets[bs.bucket_index]
                comp = packed.components[bs.component]
                box_scales = jnp.asarray(
                    [plan.scales[s].box_scale for s in bucket.scale_indices],
                    self.dtype,
                )
                # box origin: MATLAB subtracts the virtual padding; the
                # C++ demo subtracts one cell (DynamicProgram.cpp:239)
                bx, sc, mx, vd, coords = backtrack(
                    bs.rootv,
                    bs.rooti,
                    bs.tables,
                    comp,
                    box_scales,
                    box_off_x=off_x,
                    box_off_y=off_y,
                    thresh=spec.thresh,
                    max_det=max_det,
                )
                if rerank:
                    keep_coords(
                        jnp.full(sc.shape, bs.bucket_index, jnp.int32),
                        coords[0], coords[1], coords[2], comp.nparts,
                    )
                pc = comp.nparts
                if pc < p_max:  # pad part dim across components by
                    # replicating the root box (keeps union-box NMS and
                    # bounding boxes unaffected by padding)
                    rep = jnp.broadcast_to(
                        bx[:, :1], (bx.shape[0], p_max - pc, 4)
                    )
                    bx = jnp.concatenate([bx, rep], axis=1)
                    mx = jnp.pad(mx, ((0, 0), (0, p_max - pc)))
                boxes_l.append(bx)
                scores_l.append(sc)
                mix_l.append(mx)
                valid_l.append(vd)
                comp_l.append(jnp.full(sc.shape, bs.component, jnp.int32))

            boxes = jnp.concatenate(boxes_l, axis=0)
            scores = jnp.concatenate(scores_l, axis=0)
            mixtures = jnp.concatenate(mix_l, axis=0)
            valid = jnp.concatenate(valid_l, axis=0)
            comps = jnp.concatenate(comp_l, axis=0)

            if rerank:
                # select by RAW root score (thresholding moves to the
                # fp32 re-score: a candidate the bf16 pipeline puts just
                # below thresh may be above it in fp32).
                # isfinite(top) identifies real placements BECAUSE this
                # serving path always calls root_scores with params=None,
                # whose masking value is -inf (pipeline.root_scores:
                # `neg = -1e10 if params is not None else -inf`). Anyone
                # threading traced params through a rerank detector must
                # thread backtrack's valid flags here instead.
                top, order = jax.lax.top_k(scores, max_det)
                real = jnp.isfinite(top)
                from .ops.rescore import rescore_from_responses

                sc32, bx32 = rescore_from_responses(
                    resps32,
                    rtables,
                    comps[order],
                    jnp.concatenate(bid_l, axis=0)[order],
                    jnp.concatenate(si_l, axis=0)[order],
                    jnp.concatenate(xs_l, axis=0)[order],
                    jnp.concatenate(ys_l, axis=0)[order],
                    mixtures[order],
                    box_off_x=off_x,
                    box_off_y=off_y,
                )
                sc32 = jnp.where(real, sc32, NEG_INF)
                ord2 = jnp.argsort(-sc32)  # stable: bf16 order on ties
                order = order[ord2]
                top = sc32[ord2]
                out_boxes = bx32[ord2]
                out_valid = top >= spec.thresh
            else:
                masked = jnp.where(valid, scores, NEG_INF)
                top, order = jax.lax.top_k(masked, max_det)
                out_boxes = boxes[order]
                out_valid = top > NEG_INF
            if self.nms_overlap is not None:
                from .ops.nms import part_nms_device

                keep = part_nms_device(
                    out_boxes, top, out_valid, self.nms_overlap
                )
                out_valid = out_valid & keep
            out = (
                out_boxes,
                top,
                comps[order],
                out_valid,
                mixtures[order],
            )
            if dev_filter:
                from .ops.depth_device import depth_keep_mask

                out = out + (
                    depth_keep_mask(
                        depth,
                        out_boxes,
                        comps[order],
                        parent_tbl,
                        norm_tbl,
                    ),
                )
            return out

        fn._fft_spectra = fft_sp
        return fn
