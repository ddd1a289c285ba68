#!/usr/bin/env python
"""TPU A/B: rank_image histogram/gather chunk sizes (hc, gc) under the
64 MB scoped-VMEM limit, plus a B=1 fused-vs-XLA frontend check."""
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


def timecall(jf, *args, iters=30):
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
    from ros_vision_tpu.ops import frontend_pallas as fp
    from ros_vision_tpu.ops import threshold as thr
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

    ref = None
    configs = ((8, 2), (8, 4), (8, 8), (16, 4), (16, 8), (16, 16))
    jfs = {}
    for hc, gc in configs:
        jf = jax.jit(lambda t, hc=hc, gc=gc: fp.rank_image(t, hc=hc, gc=gc))
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(jf(threshim))
            comp = time.perf_counter() - t0
        except Exception as e:
            print(f"hc={hc:2d} gc={gc:2d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        if ref is None:
            ref = out
        ok = bool(jnp.array_equal(out, ref))
        print(f"hc={hc:2d} gc={gc:2d}: parity={ok} compile={comp:.0f}s",
              flush=True)
        jfs[(hc, gc)] = jf
    # time in TWO interleaved passes and report per-config minima: the
    # first timed config on a fresh relay connection is reliably 3-4x
    # slow (warm-up artifact observed on back-to-back runs)
    best = {k: float("inf") for k in jfs}
    for _ in range(2):
        for k, jf in jfs.items():
            best[k] = min(best[k], timecall(jf, threshim))
    for (hc, gc), t in best.items():
        print(f"hc={hc:2d} gc={gc:2d}: {t:7.2f} ms ({t/B:5.2f}/frame)",
              flush=True)


if __name__ == "__main__":
    main()
