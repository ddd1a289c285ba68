#!/usr/bin/env python
"""Chip sweep of the flood kernel's unit_passes schedule (+ broadcast
mode interaction): full label_components_flood timing + parity at
(B, 400, 640) on the noisy bench scene."""
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

B = int(os.environ.get("MB_B", "8"))


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
    from ros_vision_tpu.ops import ccl, threshold as thr
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

    cases = [(up, bc, False) for up in (1, 4, 8, 16, 24)
             for bc in ("gather", "flood")]
    if os.environ.get("MB_SPARSE"):
        # sparse-diagonal unit-pass schedule A/B (straight-only passes,
        # full 8-dir last pass): only meaningful at several passes/sweep
        cases = [(up, "gather", sd) for up in (8, 12, 16)
                 for sd in (False, True)]
    ref = None
    for up, bc, sd in cases:
        jf = jax.jit(
            lambda t, up=up, bc=bc, sd=sd: ccl.label_components_flood(
                t, unit_passes=up, broadcast=bc, sparse_diag=sd))
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(jf(threshim))
            comp = time.perf_counter() - t0
        except Exception as e:
            print(f"up={up:2d} bc={bc:6s} sd={int(sd)}: COMPILE FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        if ref is None:
            ref = out
        ok = all(bool(jnp.array_equal(a, b_)) for a, b_ in zip(out, ref))
        ms = timecall(jf, threshim)
        print(f"up={up:2d} bc={bc:6s} sd={int(sd)}: {ms:7.2f} ms "
              f"({ms / B:5.2f}/frame) parity={ok} compile={comp:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
