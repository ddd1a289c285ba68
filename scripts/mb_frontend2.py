#!/usr/bin/env python
"""TPU validation + timing for the round-3 Pallas frontend pieces.
Prints incrementally; each stage survives the previous one failing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ros_vision_tpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

B = int(os.environ.get("MB_B", "4"))


def timecall(jf, *args, iters=20):
    out = jf(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(iters)]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[0])[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl, frontend_pallas as fp
    from ros_vision_tpu.ops import gather_pallas as gp
    from ros_vision_tpu.ops import quadfit, threshold as thr
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())
    threshim = jax.block_until_ready(thr.adaptive_threshold(
        thr.decimate2(g))[0])
    qcfg = quadfit.QuadFitConfig()

    # 1. segment_min_max kernel
    try:
        rng = np.random.default_rng(0)
        seg = jnp.asarray(rng.integers(0, 1025, (B, 131072)), jnp.int32)
        val = jnp.asarray(rng.integers(0, 2000, (B, 131072)), jnp.int32)
        mn, mx = gp.segment_min_max(seg, val, 1025)
        rmn, rmx = gp.segment_min_max_ref(seg, val, 1025)
        ok = (np.array_equal(np.asarray(mn), np.asarray(rmn))
              and np.array_equal(np.asarray(mx), np.asarray(rmx)))
        t = timecall(lambda s, v: gp.segment_min_max(s, v, 1025), seg, val)
        print(f"1 minmax: parity={ok} {t:.2f} ms total", flush=True)
    except Exception as e:
        print(f"1 minmax FAIL: {str(e)[:160]}", flush=True)

    # 2. fused frontend compile + parity
    try:
        jf = jax.jit(lambda t: fp.frontend(t, qcfg.max_points,
                                           qcfg.max_boundary_pixels))
        t0 = time.perf_counter()
        pts_n, cnt_n = jax.block_until_ready(jf(threshim))
        comp = time.perf_counter() - t0
        t = timecall(jf, threshim)
        print(f"2 fused frontend: {t:.2f} ms total {t/B:.2f}/frame "
              f"(compile {comp:.0f}s)", flush=True)
        jo = jax.jit(lambda t: quadfit.boundary_points(
            t, ccl.label_components_flood(t)[2], qcfg))
        t0 = time.perf_counter()
        pts_o, cnt_o = jax.block_until_ready(jo(threshim))
        compo = time.perf_counter() - t0
        to = timecall(jo, threshim)
        print(f"2 old ccl+boundary: {to:.2f} ms total {to/B:.2f}/frame "
              f"(compile {compo:.0f}s)", flush=True)
        k = qcfg.max_points
        same = (np.array_equal(np.asarray(cnt_o), np.asarray(cnt_n))
                and np.array_equal(np.asarray(pts_o["key"]),
                                   np.asarray(pts_n["key"])[:, :k])
                and np.array_equal(np.asarray(pts_o["pack2"]),
                                   np.asarray(pts_n["pack2"])[:, :k]))
        print(f"2 parity: {same}  counts={np.asarray(cnt_n)}", flush=True)
    except Exception as e:
        print(f"2 frontend FAIL: {str(e)[:200]}", flush=True)
        return

    # 3. full detector with fused frontend forced
    from ros_vision_tpu.apriltag.detector import DetectorConfig, TPUDetector
    intr = None
    for fused in (False, True):
        try:
            det = TPUDetector(DetectorConfig(
                width=1280, height=800, fx=900.0, fy=900.0, cx=640.0,
                cy=400.0, estimate_pose=True, use_fused_frontend=fused))
            if intr is None:
                intr = jnp.asarray(det.default_intrinsics(B))
            t0 = time.perf_counter()
            jax.block_until_ready(det._fn(g, intr))
            comp = time.perf_counter() - t0
            t = timecall(det._fn, g, intr)
            ids = sorted(d.tag_id for d in det.detect(img))
            print(f"3 detector fused={fused}: {t:.2f} ms total "
                  f"{t/B:.2f}/frame ids={ids} (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"3 detector fused={fused} FAIL: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
