#!/usr/bin/env python
"""Pallas bitonic sort (ops/sort_pallas.py) vs lax.sort on chip:
compile-probe, bit-parity, and queued timing at the cluster_and_fit
shapes. Run with MB_B / MB_K to vary batch and width."""
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
K = int(os.environ.get("MB_K", "65536"))


def timecall(jf, *args, iters=20):
    out = jf(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(iters)]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[0])[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def bench_route():
    """boundary_points with sort vs XLA monotone-routing compactions at
    the production shape and at 1080p (where the Pallas kernels can't
    run — non-128-multiple lane width)."""
    import dataclasses
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl, quadfit, threshold as thr

    for w, h, kpts in [(1280, 800, 65536), (1920, 1080, 131072)]:
        img, _ = render_scene(
            [0, 42], [simple_square_corners(w // 4, h // 3, h // 9),
                      simple_square_corners(2 * w // 3, h // 2, h // 8,
                                            angle_deg=20)],
            w, h, noise_sigma=1.0)
        g = jnp.asarray(np.broadcast_to(img, (B, h, w)).copy())
        cfg = quadfit.QuadFitConfig(max_points=kpts)

        @jax.jit
        def front(g):
            decim = thr.decimate2(g)
            t, _ = thr.adaptive_threshold(decim)
            if (h // 2) * (w // 2) < (1 << 19):
                _, _, ranks = ccl.label_components_flood(t)
            else:
                _, _, ranks = ccl.label_components(t)
            return t, ranks

        t_img, ranks = jax.block_until_ready(front(g))
        outs = {}
        for name, c in [("sort", cfg),
                        ("route", dataclasses.replace(
                            cfg, route_compaction=True))]:
            bf = jax.jit(lambda t, r, c=c: quadfit.boundary_points(
                t, r, c))
            outs[name] = jax.block_until_ready(bf(t_img, ranks))
            ms = timecall(bf, t_img, ranks)
            print(f"{w}x{h} K={kpts} boundary[{name}]: {ms:.3f} ms "
                  f"({ms / B:.3f}/frame)")
        ok = all(np.array_equal(np.asarray(outs['sort'][0][kk]),
                                np.asarray(outs['route'][0][kk]))
                 for kk in outs['sort'][0]) and np.array_equal(
            np.asarray(outs['sort'][1]), np.asarray(outs['route'][1]))
        print(f"{w}x{h} route parity: {ok}")


def main():
    from ros_vision_tpu.ops.sort_pallas import sort_tpu
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 22, (B, K)).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 1 << 28, (B, K)).astype(np.int32))
    c = jnp.asarray(rng.integers(0, 1 << 20, (B, K)).astype(np.int32))

    for label, nk, ops in [("1key", 1, [a]), ("2key", 2, [a, b]),
                           ("3key", 3, [a, b, c])]:
        pf = jax.jit(lambda *o, nk=nk: sort_tpu(list(o), num_keys=nk))
        xf = jax.jit(lambda *o, nk=nk: jax.lax.sort(
            list(o), dimension=1, num_keys=nk, is_stable=True))
        try:
            t0 = time.perf_counter()
            got = jax.block_until_ready(pf(*ops))
            print(f"{label}: pallas compile+run ok "
                  f"({time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # helper crash
            print(f"{label}: PALLAS COMPILE FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        want = jax.block_until_ready(xf(*ops))
        ok = all(np.array_equal(np.asarray(g), np.asarray(w))
                 for g, w in zip(got, want))
        tp = timecall(pf, *ops)
        tx = timecall(xf, *ops)
        print(f"{label}: parity={ok}  pallas {tp:.3f} ms "
              f"({tp / B:.3f}/frame)  lax {tx:.3f} ms ({tx / B:.3f}/frame)")

    if os.environ.get("MB_ROUTE", "1") != "0":
        bench_route()


if __name__ == "__main__":
    main()
