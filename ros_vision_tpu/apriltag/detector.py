"""TPUDetector — the batched, jitted AprilTag detection pipeline.

TPU-native equivalent of the reference's GpuDetector orchestrator
(apriltag_gpu.cu:111-188, Detect() chain at :725-1097) plus its host finish
(apriltag_detect.cu): ONE jit-compiled function takes a (B, H, W) uint8
batch of grayscale frames (the camera axis is the batch axis — the
reference's per-camera process pairs become rows of this tensor) and returns
fixed-shape detection tensors: ids, corners, homographies, poses. No
mid-pipeline host syncs (the reference syncs 4 counters per frame,
apriltag_gpu.cu:806,938,1016,1073); a single device->host copy returns the
final detection slots.

For multi-chip scale-out, shard the batch axis over a mesh — see
ros_vision_tpu.parallel.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ros_vision_tpu.apriltag.families import TagFamily, get_family
from ros_vision_tpu.ops import ccl, decode as dec, pose as poseops
from ros_vision_tpu.ops import quadfit, threshold as thr


@dataclasses.dataclass
class TPUDetection:
    tag_id: int
    hamming: int
    decision_margin: float
    center: np.ndarray
    corners: np.ndarray
    H: np.ndarray
    pose_R: np.ndarray | None = None
    pose_t: np.ndarray | None = None
    pose_err: float | None = None


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    width: int = 1280
    height: int = 800
    family: str = "tag36h11"
    max_points: int | None = None    # boundary-point capacity K (None =
    # auto: smallest power of two >= decimated_px/8 in [16384, 131072],
    # except frames past 2^18 decimated px keep decimated_px/4). Auto
    # lands on the two chip-validated operating points: 32768 at
    # 1280x800 (r4: bench scene keeps 4/4 tags at 11.10 vs 12.15
    # ms/frame B=8, grayimage golden 0.260 px vs oracle on CPU; 16384
    # drops a bench tag) and 131072 at 1920x1080 (65536 measured
    # 0.74 px golden corner error vs the <0.5 px invariant — the
    # cluttered 1080p photo needs the slots).
    max_segments: int = 1024
    max_quads: int = 128
    refine_edges: bool = True
    estimate_pose: bool = True
    active_points: int | None = None  # cluster_and_fit (sorts, prefix sums,
    # moments) runs on only this many point slots when every boundary
    # candidate fits (None = auto: max_points // 4 for large configs).
    # Compaction places valid points first, so the narrow branch is exact;
    # overflowing frames take a lax.cond fallback over all max_points slots.
    # Sorts are the dominant quadfit cost and scale superlinearly with K.
    screen_hamming: int | None = 4   # loose pre-decode gate for the
    # decode-gated refine narrowing (None disables): quads whose UNREFINED
    # best-code distance exceeds this never reach refine/decode/pose.
    # Final accept stays at hamming <= 2 on refined corners.
    max_active_quads: int = 32   # refine/decode/pose process only this many
    # area-ranked quad slots when every valid quad fits (the overwhelmingly
    # common case — FRC fields have <= 16 visible tags); frames with more
    # candidates take a lax.cond fallback over all max_quads slots, so
    # results are identical either way. 4x fewer sample gathers on the hot
    # path.
    use_pallas_threshold: bool | None = None   # whole-frame fused Pallas
    # kernel for the threshold stage (ops/threshold_pallas.py): decimate
    # + tile min/max + dilation + threshold in one kernel, two decimated
    # u8 writes instead of the XLA chain's full-res traffic. Measured
    # 0.79 vs 1.27 ms/frame standalone and 13.28 vs 13.76 in-detector at
    # (8, 400, 640) on the relay v5e, bit-exact. None = auto: TPU
    # backend + probe compile; CPU keeps XLA (interpret would crawl).
    use_pallas_ccl: bool | None = None   # VMEM propagation kernel for CCL
    # (ops/ccl_pallas.py, ~2x on TPU); None = auto (on for TPU backends,
    # off for CPU where interpret-mode sweeps would crawl)
    use_fused_frontend: bool | str | None = None   # Pallas fused frontend
    # (ops/frontend_pallas.py). "full" / True: rank_image (masks + flood +
    # histogram + ranks in ONE kernel, replacing label_components_flood)
    # + boundary_compact (monotone-routing compaction) — measured 6.98 vs
    # 12.46 ms/frame for ccl+boundary at (4, 400, 640) on the relay v5e,
    # bit-identical outputs incl. counts and slot order. "boundary":
    # boundary_compact only, ranks from the XLA/flood CCL. "rank":
    # rank_image only (in-kernel CCL + sizes + rank broadcast), boundary
    # via the XLA path — works at any shape up to 2^20 padded px
    # (rank_image pads non-tile-aligned shapes with 127 "own blob"
    # pixels, exactly rank-preserving) but measured SLOWER than the
    # flood+XLA-epilogue default at 1080p (39.7 vs 29.1 ms/frame B=1),
    # so auto never picks it. None = auto: TPU backend, the decimated
    # frame is routable (h*w <= 2^18), AND a probe compile succeeds —
    # tried "full" first, then "boundary" (the rank kernel needs the
    # raised vmem_limit_bytes; its former "nondeterministic" Mosaic
    # crash was a borderline scoped-VMEM stack OOM, fixed r3) — falling
    # back to the XLA path instead of failing.
    use_pallas_sort: bool | None = None   # VMEM bitonic network
    # (ops/sort_pallas.py) for the three (B, K) cluster_and_fit sorts
    # instead of lax.sort — identical outputs (all operands are keys).
    # None = OFF: the kernels compile (r4 fixed the Mosaic i1-select
    # crash) but measured slower in-detector than lax.sort (10.53 vs
    # 10.08 ms/frame, K=32768 B=8). True opts in for experiments.
    route_compaction: bool | None = None   # pure-XLA monotone-routing
    # stream compaction (ops/segments.compact_route) for the two
    # boundary_points compactions instead of lax.sort — bit-identical
    # outputs, shape-unconstrained (serves 1080p frames the Pallas
    # boundary kernels can't take). Measured on the relay v5e
    # (scripts/mb_sort.py bench_route): 2.92 vs 4.17 ms/frame at
    # (4, 400, 640) K=65536 and 5.00 vs 7.42 at 1080p K=131072, exact
    # parity both. None = auto: on for TPU backends whenever the fused
    # Pallas boundary path is NOT taken (probe failure or non-routable
    # frame) — the sort compaction is never the best available path.
    tag_size: float = 0.1651          # meters (apriltags_cuda_detector.hpp:39)
    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    dist: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)

    def __post_init__(self):
        assert self.width % 8 == 0 and self.height % 8 == 0, \
            "width/height must be multiples of 8 (apriltag_gpu.cu:754-755)"


def pack_outputs(out: dict) -> jnp.ndarray:
    """Flatten the per-quad output dict into ONE (B, NQ, C) f32 tensor.

    The relay-attached chip pays ~46 ms RTT PER device->host transfer, so
    fetching the ~10-leaf output tree costs ~10 RTTs; a single packed
    tensor costs one. tag_id (< 587) and hamming (<= 2) are exact in f32.
    Layout: [ok, tag_id, hamming, margin, H(9), corners(8), centers(2)
    (+ pose_R(9), pose_t(3), pose_err when pose is on)]."""
    b, nq = out["ok"].shape
    parts = [out["ok"].astype(jnp.float32)[..., None],
             out["tag_id"].astype(jnp.float32)[..., None],
             out["hamming"].astype(jnp.float32)[..., None],
             out["margin"][..., None],
             out["H"].reshape(b, nq, 9),
             out["corners"].reshape(b, nq, 8),
             out["centers"].reshape(b, nq, 2)]
    if "pose_t" in out:
        parts += [out["pose_R"].reshape(b, nq, 9),
                  out["pose_t"].reshape(b, nq, 3),
                  out["pose_err"][..., None]]
    return jnp.concatenate(parts, axis=-1)


def unpack_outputs(packed: np.ndarray) -> dict:
    """Host-side inverse of pack_outputs (numpy views, no copies)."""
    p = np.asarray(packed)
    out = {
        "ok": p[..., 0] > 0.5,
        "tag_id": p[..., 1].astype(np.int32),
        "hamming": p[..., 2].astype(np.int32),
        "margin": p[..., 3],
        "H": p[..., 4:13].reshape(p.shape[:2] + (3, 3)),
        "corners": p[..., 13:21].reshape(p.shape[:2] + (4, 2)),
        "centers": p[..., 21:23],
    }
    if p.shape[-1] > 23:
        out["pose_R"] = p[..., 23:32].reshape(p.shape[:2] + (3, 3))
        out["pose_t"] = p[..., 32:35]
        out["pose_err"] = p[..., 35]
    return out


class TPUDetector:
    """Batched detector. Build once per (config, batch) — compiled on first
    call, cached thereafter."""

    def __init__(self, config: DetectorConfig | None = None, **kw):
        if config is None:
            config = DetectorConfig(**kw)
        if config.max_points is None:
            dp = (config.height // 2) * (config.width // 2)
            # dp//8 at production-class frames (32768 at 1280x800 —
            # chip-validated: bench scene keeps 4/4 tags, grayimage golden
            # 0.260 px vs oracle on CPU; 16384 drops a bench tag, so the
            # floor stays one notch above it). Frames past 2^18 decimated
            # px (1080p class) keep dp//4: the cluttered 1080p golden
            # needs 131072 (65536 measured 0.74 px vs the 0.5 invariant).
            div = 4 if dp > (1 << 18) else 8
            mp = 16384
            while mp < min(max(dp // div, 16384), 131072):
                mp *= 2
            config = dataclasses.replace(config, max_points=mp)
        self.config = config
        self.family: TagFamily = get_family(config.family)
        # kept as a HOST (numpy) constant on purpose: a persistent
        # device-resident jnp array captured by the jitted closure embeds
        # as an Array constant whose VALUE is fetched device->host at
        # EVERY lowering (jax mlir ir_constant -> Array._value) — on the
        # axon relay that is a ~46 ms+ readback per trace, observed
        # stalling warmup. A numpy constant embeds without any device
        # traffic and compiles to the identical HLO literal.
        self._code_matrix = np.asarray(dec.make_code_matrix(self.family))
        self._qcfg = quadfit.QuadFitConfig(
            max_points=config.max_points,
            max_segments=config.max_segments,
            max_quads=config.max_quads,
            tag_width=max(3, self.family.border_size // dec.QUAD_DECIMATE),
            normal_border=not self.family.reversed_border,
            reversed_border=self.family.reversed_border)
        ka = config.active_points
        if ka is None:
            ka = config.max_points // 4 if config.max_points >= 32768 \
                else config.max_points
        self._active_points = min(ka, config.max_points)
        self._qcfg_narrow = dataclasses.replace(
            self._qcfg, max_points=self._active_points)
        self._use_fused = self._resolve_fused_frontend()
        self._use_pallas_threshold = self._resolve_pallas_threshold()
        if self._resolve_pallas_sort():
            self._qcfg = dataclasses.replace(self._qcfg,
                                             use_pallas_sort=True)
            self._qcfg_narrow = dataclasses.replace(self._qcfg_narrow,
                                                    use_pallas_sort=True)
        rc = config.route_compaction
        if rc is None:   # auto: the routing chain beats the sort
            # compaction on chip (field comment has the numbers), so use
            # it whenever the fused Pallas boundary path is off; CPU
            # keeps the sorts (rolls don't win there, and tests pin both
            # paths explicitly).
            rc = (jax.default_backend() in ("tpu", "axon")
                  and not self._use_fused)
        if rc:
            self._qcfg = dataclasses.replace(self._qcfg,
                                             route_compaction=True)
            self._qcfg_narrow = dataclasses.replace(self._qcfg_narrow,
                                                    route_compaction=True)
        self._fn = jax.jit(self._detect_device)
        self._fn_packed = jax.jit(
            lambda g, i: pack_outputs(self._detect_device(g, i)))

    def _resolve_fused_frontend(self) -> bool | str:
        """Resolve use_fused_frontend=None: TPU backend + routable frame
        + a successful probe compile (AOT, b=2 so Mosaic's grid
        double-buffering is exercised — b=1 skips it; the persistent
        compilation cache makes reruns free). Tries the FULL fused
        frontend (rank_image + boundary_compact) first, then
        boundary-only. The Mosaic compile helper rejects some kernel
        shapes/sessions; probing keeps a helper regression from taking
        down detection."""
        cfg = self.config
        uf = cfg.use_fused_frontend
        if uf is not None:
            return "full" if uf is True else uf
        dh, dw = cfg.height // 2, cfg.width // 2
        if not (jax.default_backend() in ("tpu", "axon")
                and dw % 128 == 0 and dh % 8 == 0 and dh * dw <= (1 << 18)):
            # big frames: "rank" mode (rank_image pads odd shapes itself)
            # is available explicitly but measured SLOWER at 1080p —
            # 39.7 vs 29.1 ms/frame B=1 on chip: the factored one-hot
            # hist/gather scales with (hi_dim + 512) * n while the XLA
            # epilogue's random gather scales with n, and the crossover
            # lands between the bench and 1080p sizes. Exact parity
            # (0.0000 px corner delta on the 1080p golden) either way.
            return False
        from ros_vision_tpu.ops import frontend_pallas as fp
        thr_s = jax.ShapeDtypeStruct((2, dh, dw), jnp.uint8)
        rank_s = jax.ShapeDtypeStruct((2, dh, dw), jnp.int32)
        bc = functools.partial(fp.boundary_compact,
                               p_cap=self._qcfg.max_boundary_pixels,
                               k_cap=cfg.max_points)
        try:
            jax.jit(fp.rank_image).lower(thr_s).compile()
            jax.jit(bc).lower(thr_s, rank_s).compile()
            return "full"
        except Exception:
            pass
        try:
            jax.jit(bc).lower(thr_s, rank_s).compile()
            return "boundary"
        except Exception:  # helper crash -> XLA fallback, never fatal
            return False

    def _resolve_pallas_threshold(self) -> bool:
        """Resolve use_pallas_threshold=None: TPU backend + a probe
        compile of the whole-frame threshold kernel (same Mosaic-helper
        insurance as the fused frontend)."""
        cfg = self.config
        upt = cfg.use_pallas_threshold
        if upt is not None:
            return upt
        if jax.default_backend() not in ("tpu", "axon"):
            return False
        try:
            from ros_vision_tpu.ops.threshold_pallas import (
                adaptive_threshold_fused)
            jax.jit(adaptive_threshold_fused).lower(
                jax.ShapeDtypeStruct((2, cfg.height, cfg.width),
                                     jnp.uint8)).compile()
            return True
        except Exception:  # helper crash -> XLA fallback, never fatal
            return False

    def _resolve_pallas_sort(self) -> bool:
        """Resolve use_pallas_sort=None: OFF. The bitonic kernels compile
        now (the r3-era Mosaic crash was an i1-operand vector select,
        fixed r4) but MEASURED SLOWER in-detector than lax.sort on the
        v5e chip (10.53 vs 10.08 ms/frame at K=32768 B=8, bit-parity) —
        fusion boundaries favor lax.sort. Auto therefore never picks
        them; pass use_pallas_sort=True to opt in for experiments."""
        ups = self.config.use_pallas_sort
        if ups is not None:
            return ups
        return False

    def _probe_pallas_sort_compiles(self) -> bool:
        """Former auto probe, kept for experiments/regression checks."""
        try:
            from ros_vision_tpu.ops.sort_pallas import sort_tpu

            def probe(a, b, an, bn):
                return (sort_tpu([a, b], num_keys=2),
                        sort_tpu([a], num_keys=1),
                        sort_tpu([a, b, a], num_keys=3),
                        sort_tpu([an, bn], num_keys=2),
                        sort_tpu([an], num_keys=1),
                        sort_tpu([an, bn, an], num_keys=3))

            s = lambda k: jax.ShapeDtypeStruct((2, k), jnp.int32)  # noqa
            jax.jit(probe).lower(s(self._qcfg.max_points),
                                 s(self._qcfg.max_points),
                                 s(self._active_points),
                                 s(self._active_points)).compile()
            return True
        except Exception:  # helper crash -> lax.sort, never fatal
            return False

    def default_intrinsics(self, batch: int) -> np.ndarray:
        """(B, 9) [fx, fy, cx, cy, k1, k2, p1, p2, k3] from the config —
        override per call for per-camera calibrations."""
        cfg = self.config
        row = np.array([cfg.fx, cfg.fy, cfg.cx, cfg.cy, *cfg.dist],
                       np.float32)
        return np.tile(row, (batch, 1))

    # ---- the jitted pipeline --------------------------------------------
    def _detect_device(self, gray: jnp.ndarray, intr: jnp.ndarray):
        """gray (B, H, W) uint8; intr (B, 9) per-camera
        [fx, fy, cx, cy, k1, k2, p1, p2, k3] (the reference loads one
        calibrationmatrix_<serial>.json per camera,
        apriltags_cuda_detector.cu:315-371)."""
        cfg = self.config
        if self._use_pallas_threshold:
            from ros_vision_tpu.ops.threshold_pallas import (
                adaptive_threshold_fused)
            decim, threshim = adaptive_threshold_fused(
                gray, interpret=jax.default_backend() not in ("tpu", "axon"))
        else:
            decim = thr.decimate2(gray)
            threshim, _ = thr.adaptive_threshold(decim)
        dh, dw = cfg.height // 2, cfg.width // 2
        if self._use_fused == "full":
            # ONE Pallas kernel for masks+flood+histogram+ranks
            # (rank_image) + the monotone-routing boundary compaction —
            # no HBM label/size planes at all. Bit-identical pts/counts
            # vs the XLA path (chip-verified, scripts/mb_frontend.py:
            # 6.98 vs 12.46 ms/frame for ccl+boundary at (4, 400, 640)).
            from ros_vision_tpu.ops import frontend_pallas as fp
            pts, _counts = fp.frontend(
                threshim, cfg.max_points, self._qcfg.max_boundary_pixels,
                interpret=jax.default_backend() not in ("tpu", "axon"))
            return self._cluster_and_tail(gray, decim, pts, _counts, intr)
        if self._use_fused == "rank":
            # in-kernel CCL + sizes + rank broadcast (rank_image) for
            # frames too large to route in-kernel: skips the XLA
            # epilogue's (B, N) random rank gather, which lowers
            # near-scalar and dominates the CCL at 518k px. Boundary
            # stays on the XLA sort-compaction path.
            from ros_vision_tpu.ops import frontend_pallas as fp
            ranks_img = fp.rank_image(
                threshim,
                interpret=jax.default_backend() not in ("tpu", "axon"))
            pts, _counts = quadfit.boundary_points(
                threshim, ranks_img.reshape(ranks_img.shape[0], -1),
                self._qcfg)
            return self._cluster_and_tail(gray, decim, pts, _counts, intr)
        use_pallas_ccl = cfg.use_pallas_ccl
        if use_pallas_ccl is None:
            # auto: TPU backend AND the VMEM-resident kernel's working set
            # fits the 16MB scoped limit. Connectivity masks are built
            # XLA-side, so the kernel holds only ~3 full-frame planes —
            # verified compiling + running at 540x960 (1080p decimated,
            # 518k px). Bound is 2^19 so the flood path's 19-bit packed
            # component sizes stay exact (ops/ccl.py packing invariant).
            use_pallas_ccl = (jax.default_backend() in ("tpu", "axon")
                              and (cfg.width // 2) * (cfg.height // 2)
                              < (1 << 19))
        if use_pallas_ccl:
            # stride-ladder flood to fixpoint: fully kernel-resident, no
            # XLA hook/pointer-jump rounds (exact parity with
            # label_components). A rank-only MXU one-hot gather epilogue
            # was measured SLOWER than the packed take_along_axis (43.8
            # vs 39.3 ms at B=4 — the (K, 512) one-hot intermediate costs
            # ~16 KB VMEM traffic per pixel; gather_pallas.rank_gather
            # keeps the receipts), so the full flood path stays.
            _labels, _sizes, ranks = ccl.label_components_flood(threshim)
        else:
            _labels, _sizes, ranks = ccl.label_components(threshim)
        if self._use_fused:
            # Pallas monotone-routing boundary compaction (the two
            # lax.sort compactions become three small VMEM routing
            # kernels — bit-identical outputs, ~2.4 ms/frame faster at
            # (4, 400, 640)). Ranks still come from the XLA/flood CCL:
            # fusing the rank epilogue into a kernel measured SLOWER
            # (ops/ccl.py flood_ranks keeps the receipts).
            from ros_vision_tpu.ops.frontend_pallas import boundary_compact
            key, pack2, _counts = boundary_compact(
                threshim, ranks.reshape(-1, dh, dw),
                self._qcfg.max_boundary_pixels, cfg.max_points,
                interpret=jax.default_backend() not in ("tpu", "axon"))
            pts = {"key": key, "pack2": pack2}
        else:
            pts, _counts = quadfit.boundary_points(threshim, ranks,
                                                   self._qcfg)
        return self._cluster_and_tail(gray, decim, pts, _counts, intr)

    def _cluster_and_tail(self, gray, decim, pts, _counts, intr):
        """Quad fitting + refine/decode/pose from compacted boundary
        points. pts arrays may be wider than max_points (the fused
        frontend pads to whole image rows); valid points always sit in
        the leading slots either way."""
        cfg = self.config
        k_full = pts["key"].shape[1]
        ka = self._active_points

        def slim(out):
            # only corners + quad_valid cross the lax.cond: every extra
            # branch output is a copy + (narrow side) a pad
            # dynamic-update-slice on the chip — the round-3 taps cost
            # ~300 small async-copies per call (profile, mb_profile_ops)
            return {"corners": out["corners"], "quad_valid": out["quad_valid"]}

        if ka < k_full:
            # compaction places valid candidates first, so when every frame
            # fits in `ka` slots the narrow cluster_and_fit is exact; only
            # overflowing frames pay for full-width sorts
            def narrow():
                ptsn = {kk: v[:, :ka] for kk, v in pts.items()}
                return slim(quadfit.cluster_and_fit(ptsn, decim,
                                                    self._qcfg_narrow))

            qf = jax.lax.cond(_counts.max() <= ka, narrow,
                              lambda: slim(quadfit.cluster_and_fit(
                                  pts, decim, self._qcfg)))
        else:
            qf = slim(quadfit.cluster_and_fit(pts, decim, self._qcfg))
        corners = dec.adjust_pixel_centers(qf["corners"])
        qvalid = qf["quad_valid"]

        fxs, fys, cxs, cys = (intr[:, i] for i in range(4))
        dist = intr[:, 4:9]
        # the undistortion-aware refine path is traced only when the STATIC
        # config declares distortion (25-iteration inverse model over every
        # edge sample is not free); per-camera values flow in dynamically
        use_dist = any(cfg.dist)

        def tail(corners, qvalid):
            """refine + decode + reconcile + pose over the given quad
            slots; the slot count is whatever the caller passes."""
            c = corners
            if cfg.refine_edges:
                c = dec.refine_edges(
                    gray, c, qvalid,
                    (fxs, fys, cxs, cys) if use_dist else None,
                    dist if use_dist else None,
                    reversed_border=self.family.reversed_border)
            d = dec.decode_quads(gray, c, qvalid, self.family,
                                 self._code_matrix)
            ok = d["ok"]
            H = d["H"]
            tcs = jnp.asarray([[-1, 1], [1, 1], [1, -1], [-1, -1]],
                              jnp.float32)
            px, py = dec.project(H[..., None, :, :], tcs[:, 0], tcs[:, 1])
            det_corners = jnp.stack([px, py], -1)      # (B, nq, 4, 2)
            cx0, cy0 = dec.project(H, 0.0, 0.0)
            centers = jnp.stack([cx0, cy0], -1)

            # reconcile duplicates on device (reconcile_detections): same
            # id + overlapping centers -> keep lowest hamming then highest
            # margin; score is lower-is-better, invalid slots = +inf
            score = d["hamming"].astype(jnp.float32) * 1e6 - d["margin"]
            score = jnp.where(ok, score, jnp.inf)
            diag = jnp.linalg.norm(
                det_corners[:, :, 0] - det_corners[:, :, 2], axis=-1)
            cdist = jnp.linalg.norm(centers[:, :, None, :]
                                    - centers[:, None, :, :], axis=-1)
            same = (d["tag_id"][:, :, None] == d["tag_id"][:, None, :]) & \
                (cdist < 0.5 * diag[:, :, None]) & \
                ok[:, :, None] & ok[:, None, :]
            nq = score.shape[1]
            ii = jnp.arange(nq)
            better = (score[:, None, :] < score[:, :, None]) | \
                ((score[:, None, :] == score[:, :, None])
                 & (ii[None, None, :] < ii[None, :, None]))
            loses = (same & better
                     & (ii[None, None, :] != ii[None, :, None])).any(-1)
            ok = ok & ~loses

            out = {
                "ok": ok, "tag_id": d["tag_id"], "hamming": d["hamming"],
                "margin": d["margin"], "H": H, "corners": det_corners,
                "centers": centers,
            }
            if cfg.estimate_pose and cfg.fx:
                R, t, err = poseops.estimate_poses(
                    H, cfg.tag_size, fxs, fys, cxs, cys)
                out.update({"pose_R": R, "pose_t": t, "pose_err": err})
            return out

        nq = cfg.max_quads
        na = cfg.max_active_quads
        # tail-width ladder: refine/decode/pose are traced once per tier
        # and the narrowest tier whose slots hold every candidate runs
        # (exact either way — the cond only picks a tier when ALL
        # survivors fit). The 8-wide tier serves the overwhelmingly
        # common case (FRC scenes carry <= 8 visible tags; the noisy
        # bench scene screens to 4) at ~4x fewer refine sample gathers
        # than the 32-wide tier.
        tiers = sorted({min(8, na), na})
        if na < nq:
            def pad(x, w):
                widths = [(0, 0)] * x.ndim
                widths[1] = (0, nq - w)
                return jnp.pad(x, widths)

            wide = lambda: tail(corners, qvalid)      # noqa: E731
            if cfg.refine_edges and cfg.screen_hamming is not None:
                # decode-gated refine: noisy frames fill ALL quad slots
                # with junk candidates, and refine_edges' normal-search
                # gathers are ~20x a decode per quad — so run a LOOSE
                # decode on the unrefined corners first (a quad whose
                # best code is > screen_hamming bits away cannot become a
                # detection: the final gate is <= 2 bits, and refine moves
                # corners well under the ~2 px it would take to flip 3+
                # bits), then refine/decode/pose only the screened
                # survivors at the narrowest fitting tier width.
                # Random-texture quads land at hamming ~8-14, so the
                # screen removes essentially all of them.
                pre = dec.decode_quads(gray, corners, qvalid, self.family,
                                       self._code_matrix)
                screen = qvalid & (pre["hamming"] <= cfg.screen_hamming)
                prio = jnp.where(screen, pre["margin"], -jnp.inf)
                # ONE top_k at the widest tier; narrower tiers slice its
                # prefix (top_k returns descending priority order)
                _, top_idx = jax.lax.top_k(prio, na)
                nscreen = screen.sum(axis=1).max()

                def narrow(w):
                    def f():
                        c_n = jnp.take_along_axis(
                            corners, top_idx[:, :w, None, None], axis=1)
                        v_n = jnp.take_along_axis(screen, top_idx[:, :w],
                                                  axis=1)
                        return jax.tree_util.tree_map(
                            lambda x: pad(x, w), tail(c_n, v_n))
                    return f

                branch = wide
                for w in sorted(tiers, reverse=True):
                    branch = functools.partial(
                        jax.lax.cond, nscreen <= w, narrow(w), branch)
                return branch()
            # no-refine path: quads are area-priority ordered, so when
            # every frame's valid quads fit in the first `w` slots the
            # narrow branch is exact; busier frames take the full width
            nvalid = qvalid.sum(axis=1).max()
            branch = wide
            for w in sorted(tiers, reverse=True):
                branch = functools.partial(
                    jax.lax.cond, nvalid <= w,
                    (lambda w=w: jax.tree_util.tree_map(
                        lambda x: pad(x, w),
                        tail(corners[:, :w], qvalid[:, :w]))), branch)
            return branch()
        return tail(corners, qvalid)

    # ---- host API --------------------------------------------------------
    def detect_raw(self, gray_batch, intrinsics=None) -> dict:
        """Returns the raw fixed-shape device output dict. intrinsics: (B,9)
        per-camera [fx,fy,cx,cy,k1,k2,p1,p2,k3]; defaults from config."""
        g = jnp.asarray(gray_batch)
        if g.ndim == 2:
            g = g[None]
        if intrinsics is None:
            intrinsics = self.default_intrinsics(g.shape[0])
        return self._fn(g, jnp.asarray(intrinsics, jnp.float32))

    def detect_raw_packed(self, gray_batch, intrinsics=None):
        """Like detect_raw but returns the single packed (B, NQ, C) f32
        tensor (pack_outputs layout): ONE device->host transfer on fetch
        — the hot-path form for streaming over the relay."""
        g = jnp.asarray(gray_batch)
        if g.ndim == 2:
            g = g[None]
        if intrinsics is None:
            intrinsics = self.default_intrinsics(g.shape[0])
        return self._fn_packed(g, jnp.asarray(intrinsics, jnp.float32))

    def detect_yuyv(self, yuyv_batch, intrinsics=None) -> list:
        """Detect on raw YUYV422 camera frames (B, H, 2*W) uint8 — the
        reference's native camera format (Y extraction on device,
        threshold.cu:21)."""
        y = jnp.asarray(yuyv_batch)
        single = y.ndim == 2
        if single:
            y = y[None]
        results = self.unpack(self.detect_raw(thr.yuyv_to_gray(y),
                                              intrinsics))
        return results[0] if single else results

    def detect(self, gray_batch, intrinsics=None) -> list:
        """Returns a list (per batch row) of lists of TPUDetection,
        sorted by tag id (the reference sorts decode output by id,
        apriltag_detect.cu:284-288). intrinsics: optional (B, 9) per-camera
        calibration rows."""
        single = np.asarray(gray_batch).ndim == 2
        results = self.unpack(self.detect_raw(gray_batch, intrinsics))
        return results[0] if single else results

    def unpack(self, raw_out) -> list:
        """Device output (dict OR packed tensor) -> per-row TPUDetection
        lists (forces the device->host transfer; pair with
        detect_raw/detect_raw_packed for pipelined use)."""
        if not isinstance(raw_out, dict):
            out = unpack_outputs(raw_out)
        else:
            out = jax.tree_util.tree_map(np.asarray, raw_out)
        results = []
        for b in range(out["ok"].shape[0]):
            dets = []
            for q in np.nonzero(out["ok"][b])[0]:
                det = TPUDetection(
                    tag_id=int(out["tag_id"][b, q]),
                    hamming=int(out["hamming"][b, q]),
                    decision_margin=float(out["margin"][b, q]),
                    center=out["centers"][b, q],
                    corners=out["corners"][b, q],
                    H=out["H"][b, q])
                if "pose_t" in out:
                    det.pose_R = out["pose_R"][b, q]
                    det.pose_t = out["pose_t"][b, q]
                    det.pose_err = float(out["pose_err"][b, q])
                dets.append(det)
            dets.sort(key=lambda d: d.tag_id)
            results.append(dets)
        return results
