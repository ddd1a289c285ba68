#!/usr/bin/env python
"""Diagonal-chain flood variants: full label_components_flood timing on the
noisy bench scene (masks + fixpoint kernel + hist + epilogue)."""
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

    ref = None
    for ds in [(), (4,), (4, 16), (4, 32), (2, 8)]:
        try:
            jf = jax.jit(lambda t, ds=ds: ccl.label_components_flood(
                t, diag_strides=ds))
            t0 = time.perf_counter()
            out = jax.block_until_ready(jf(threshim))
            comp = time.perf_counter() - t0
            ms = timecall(jf, threshim)
            if ref is None:
                ref = [np.asarray(x) for x in out]
                ok = True
            else:
                ok = all(np.array_equal(r, np.asarray(o))
                         for r, o in zip(ref, out))
            print(f"diag={ds}: {ms:7.2f} ms ({ms/B:5.2f}/frame) "
                  f"parity={ok} (compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"diag={ds} FAIL: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
