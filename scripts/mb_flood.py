#!/usr/bin/env python
"""TPU check of the round-2 rework: flood CCL + gather_pallas kernels."""
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

from ros_vision_tpu.apriltag.render import render_scene, simple_square_corners
from ros_vision_tpu.ops import ccl, threshold as thr, gather_pallas as gp

B = int(os.environ.get("MB_B", "1"))


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
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())
    decim = thr.decimate2(g)
    threshim, _ = thr.adaptive_threshold(decim)
    threshim = jax.block_until_ready(threshim)
    print(f"B={B} threshim {threshim.shape}", flush=True)

    # gather_pallas kernels: parity + time
    rng = np.random.default_rng(0)
    K = 131072
    S = 1025
    tbl = jnp.asarray(rng.random((B, S, 4), np.float32))
    idx = jnp.asarray(rng.integers(0, S, (B, K)), jnp.int32)
    t0 = time.perf_counter()
    got = jax.block_until_ready(gp.table_take_cm(tbl, idx))
    print(f"take_cm compile {time.perf_counter()-t0:.1f}s", flush=True)
    want = gp.table_take_cm_ref(tbl, idx)
    print("take_cm parity:", bool(jnp.all(got == want)),
          f" {timecall(gp.table_take_cm, tbl, idx):.3f} ms", flush=True)

    t0 = time.perf_counter()
    goth = jax.block_until_ready(gp.value_histogram(idx, S))
    print(f"hist compile {time.perf_counter()-t0:.1f}s", flush=True)
    wanth = gp.value_histogram_ref(idx, S)
    print("hist parity:", bool(jnp.all(goth == wanth)),
          f" {timecall(lambda v: gp.value_histogram(v, S), idx):.3f} ms",
          flush=True)

    # hybrid CCL baseline
    t0 = time.perf_counter()
    ph, sh, rh = jax.block_until_ready(ccl.label_components_hybrid(threshim))
    print(f"hybrid compile {time.perf_counter()-t0:.1f}s", flush=True)
    th = timecall(ccl.label_components_hybrid, threshim)
    print(f"hybrid: {th:.2f} ms", flush=True)

    # flood CCL
    t0 = time.perf_counter()
    pf, sf, rf = jax.block_until_ready(ccl.label_components_flood(threshim))
    print(f"flood compile {time.perf_counter()-t0:.1f}s", flush=True)
    tf = timecall(ccl.label_components_flood, threshim)
    ok_p = bool(jnp.all(pf == ph))
    ok_s = bool(jnp.all(sf == sh))
    ok_r = bool(jnp.all(rf == rh))
    print(f"flood: {tf:.2f} ms  parity p={ok_p} s={ok_s} r={ok_r}",
          flush=True)


if __name__ == "__main__":
    main()
