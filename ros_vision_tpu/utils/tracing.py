"""Stage-level tracing + debug taps for the TPU pipeline.

The reference has three observability tiers (SURVEY section 5): per-stage
CUDA events with running averages (apriltag_gpu.cu:1113-1165), ~20 Copy*To
debug taps (apriltag_gpu.h:98-183), and a --sync flag forcing
synchronize+check after every kernel (cuda_frc971.cu:5-26). TPU equivalents:

  - stage_taps(): runs the pipeline stage-by-stage and returns every
    intermediate (threshold image, labels, boundary points, segment stats,
    quads, decode fields) — the Copy*To tier.
  - StageTimer: compiles each stage separately and measures queued,
    RTT-amortized per-stage times with running averages — the event tier.
  - check mode: stage_taps(check=True) validates invariants after every
    stage (finite values, in-range ids, mask consistency) and raises with
    the failing stage's name — the --sync tier.

For deeper traces use jax.profiler.trace() around detector calls.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _stages(det):
    """Build the per-stage callables for a TPUDetector."""
    from ros_vision_tpu.ops import ccl, decode as dec, pose as poseops
    from ros_vision_tpu.ops import quadfit, threshold as thr
    cfg = det.config
    qcfg = det._qcfg
    fam = det.family
    cm = det._code_matrix

    def s_threshold(gray):
        decim = thr.decimate2(gray)
        t, _ = thr.adaptive_threshold(decim)
        return {"decimated": decim, "threshim": t}

    def s_ccl(st):
        # mirror the detector's backend selection (detector.py): the flood
        # Pallas CCL on TPU, the XLA CCL on CPU — so stage timings reflect
        # the real pipeline
        if jax.default_backend() in ("tpu", "axon"):
            labels, sizes, ranks = ccl.label_components_flood(
                st["threshim"])
        else:
            labels, sizes, ranks = ccl.label_components(st["threshim"])
        return {"labels": labels, "sizes": sizes, "ranks": ranks}

    def s_boundary(st):
        pts, counts = quadfit.boundary_points(
            st["threshim"], st["ranks"], qcfg)
        return {"pts": pts, "counts": counts}

    def s_quadfit(st):
        return quadfit.cluster_and_fit(st["pts"], st["decimated"], qcfg)

    def s_refine(gray, st):
        c = dec.adjust_pixel_centers(st["corners"])
        if cfg.refine_edges:
            intr = (cfg.fx, cfg.fy, cfg.cx, cfg.cy) if any(cfg.dist) else None
            dist = jnp.asarray(cfg.dist, jnp.float32) if any(cfg.dist) \
                else None
            c = dec.refine_edges(gray, c, st["quad_valid"], intr, dist,
                                 reversed_border=fam.reversed_border)
        return {"corners_full": c}

    # (stage taps use the static config intrinsics; per-camera arrays go
    # through the detector's dynamic path)

    def s_decode(gray, st):
        return dec.decode_quads(gray, st["corners_full"],
                                st["quad_valid"], fam, cm)

    def s_pose(st):
        r, t, e = poseops.estimate_poses(
            st["H"], cfg.tag_size, cfg.fx, cfg.fy, cfg.cx, cfg.cy)
        return {"pose_R": r, "pose_t": t, "pose_err": e}

    return [("threshold", s_threshold), ("ccl", s_ccl),
            ("boundary", s_boundary), ("quadfit", s_quadfit),
            ("refine", s_refine), ("decode", s_decode), ("pose", s_pose)]


def stage_taps(det, gray, check: bool = False) -> dict:
    """Run the pipeline stage-by-stage, returning all intermediates
    (numpy). With check=True, validate invariants after each stage and
    raise RuntimeError naming the first failing stage."""
    g = jnp.asarray(gray)
    if g.ndim == 2:
        g = g[None]
    state: dict = {}
    for name, fn in _stages(det):
        if name in ("refine", "decode"):
            out = fn(g, state)
        elif name == "threshold":
            out = fn(g)
        else:
            out = fn(state)
        out = {k: v for k, v in out.items()}
        state.update(out)
        if check:
            _check_stage(name, state, det)
    return jax.tree_util.tree_map(np.asarray, state)


def _check_stage(name: str, st: dict, det) -> None:
    def fail(msg):
        raise RuntimeError(f"stage '{name}' invariant violated: {msg}")

    if name == "threshold":
        t = np.asarray(st["threshim"])
        if not np.isin(t, [0, 127, 255]).all():
            fail("threshold values outside {0,127,255}")
    elif name == "ccl":
        lab = np.asarray(st["labels"])
        n = lab.shape[1]
        if lab.min() < 0 or lab.max() >= n:
            fail("label out of range")
        if (np.asarray(st["sizes"]) < 1).any():
            fail("component size < 1")
    elif name == "boundary":
        c = np.asarray(st["counts"])
        if (c < 0).any() or (c > det._qcfg.max_points).any():
            fail("boundary count out of range")
    elif name == "quadfit":
        q = np.asarray(st["corners"])
        v = np.asarray(st["quad_valid"])
        if not np.isfinite(q[v]).all():
            fail("non-finite quad corners")
    elif name == "decode":
        h = np.asarray(st["hamming"])
        ok = np.asarray(st["ok"])
        if ok.any() and h[ok].max() > 2:
            fail("accepted decode with hamming > 2")
    elif name == "pose":
        ok = np.asarray(st["ok"])
        t = np.asarray(st["pose_t"])
        if ok.any() and not np.isfinite(t[ok]).all():
            fail("non-finite pose")


class StageTimer:
    """Queued per-stage timing with running averages (the CUDA-event tier).

    Each stage is jitted separately; times are measured by issuing `reps`
    queued calls and reading back one scalar, amortizing host<->device
    round-trip latency."""

    def __init__(self, det):
        self.det = det
        self.averages: dict = {}
        self._n = 0

    def measure(self, gray, reps: int = 10) -> dict:
        g = jnp.asarray(gray)
        if g.ndim == 2:
            g = g[None]
        state: dict = {}
        times = {}
        for name, fn in _stages(self.det):
            if name in ("refine", "decode"):
                jf = jax.jit(lambda s, g=g, fn=fn: fn(g, s))
            elif name == "threshold":
                jf = jax.jit(lambda s, g=g, fn=fn: fn(g))
            else:
                jf = jax.jit(fn)
            out = jf(state)            # compile + run once
            _touch(out)
            t0 = time.perf_counter()
            outs = [jf(state) for _ in range(reps)]
            _touch(outs[-1])
            _touch(outs[0])
            times[name] = (time.perf_counter() - t0) / reps * 1e3
            state.update(out)
        self._n += 1
        for k, v in times.items():
            avg = self.averages.get(k, v)
            self.averages[k] = avg + (v - avg) / self._n
        return times

    def report(self) -> str:
        lines = [f"{k:>10}: {v:8.2f} ms (avg)"
                 for k, v in self.averages.items()]
        total = sum(self.averages.values())
        lines.append(f"{'total':>10}: {total:8.2f} ms")
        return "\n".join(lines)


def _touch(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf).ravel()[:1]
