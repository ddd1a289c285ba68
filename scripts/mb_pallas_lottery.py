#!/usr/bin/env python
"""Fused-frontend compile lottery: the Mosaic compile helper crashes
NONDETERMINISTICALLY on some frontend_pallas kernels (CLAUDE.md). This
probe compiles each kernel SEPARATELY, with retries, to map which ones
fail today: rank_image (flood+hist+gather matmuls), boundary stage A
(bits+thin+route), stage B (expand+route+finish), and the full
boundary_compact. Run when the chip is otherwise idle."""
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
TRIES = int(os.environ.get("MB_TRIES", "3"))


def try_compile(name, lowered, tries=TRIES):
    for i in range(tries):
        try:
            t0 = time.perf_counter()
            comp = lowered.compile()
            print(f"{name}: COMPILED try {i + 1} in "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            return comp
        except Exception as e:
            print(f"{name}: FAIL try {i + 1}: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
    return None


def main():
    from jax.experimental import pallas as pl
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import ccl, frontend_pallas as fp
    from ros_vision_tpu.ops import quadfit, threshold as thr

    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())

    @jax.jit
    def setup(g):
        t, _ = thr.adaptive_threshold(thr.decimate2(g))
        _, _, ranks = ccl.label_components_flood(t)
        return t, ranks

    threshim, ranks = jax.block_until_ready(setup(g))
    b, h, w = threshim.shape
    ranks_img = ranks.reshape(b, h, w)
    qcfg = quadfit.QuadFitConfig(max_points=K)
    p_cap = qcfg.max_boundary_pixels
    br = fp.boundary_block_rows(p_cap, w)
    out_rows = min(-(-(-(-K // w)) // 8) * 8, 4 * br)

    # ---- rank_image (batched hist/gather matmul kernel) ------------------
    rk = try_compile("rank_image", jax.jit(
        lambda t: fp.rank_image(t)).lower(threshim))
    if rk is not None:
        got = jax.block_until_ready(rk(threshim))
        ok = np.array_equal(np.asarray(got).reshape(b, -1),
                            np.asarray(ranks))
        print(f"rank_image parity: {ok}", flush=True)

    # ---- stage A alone ----------------------------------------------------
    def stage_a(t, r):
        spec = lambda sh: pl.BlockSpec(  # noqa: E731
            (1,) + sh, lambda i: (i,) + (0,) * len(sh),
            memory_space=fp.pltpu.VMEM)
        return pl.pallas_call(
            fp._make_stage_a_kernel(h, w, br),
            grid=(b,),
            in_specs=[spec((h, w)), spec((h, w))],
            out_specs=(spec((br, w)),) * 5,
            out_shape=(jax.ShapeDtypeStruct((b, br, w), jnp.int32),) * 5,
        )(t, r)

    sa = try_compile("stage_a", jax.jit(stage_a).lower(threshim, ranks_img))
    planes = None
    if sa is not None:
        planes = jax.block_until_ready(sa(threshim, ranks_img))
        print("stage_a ran", flush=True)

    # ---- stage B alone ----------------------------------------------------
    def stage_b(*p5):
        spec = lambda sh: pl.BlockSpec(  # noqa: E731
            (1,) + sh, lambda i: (i,) + (0,) * len(sh),
            memory_space=fp.pltpu.VMEM)
        return pl.pallas_call(
            fp._make_stage_b_kernel(w, br, K, out_rows),
            grid=(b,),
            in_specs=[spec((br, w))] * 5,
            out_specs=(spec((out_rows, w)), spec((out_rows, w)),
                       pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                                    memory_space=fp.pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((b, out_rows, w), jnp.int32),
                       jax.ShapeDtypeStruct((b, out_rows, w), jnp.int32),
                       jax.ShapeDtypeStruct((b, 1, 1), jnp.int32)),
        )(*p5)

    zero5 = tuple(jnp.zeros((b, br, w), jnp.int32) for _ in range(5))
    sb = try_compile("stage_b", jax.jit(stage_b).lower(*zero5))
    if sb is not None and planes is not None:
        key, pack2, cnt = jax.block_until_ready(sb(*planes))
        xla_fn = jax.jit(lambda t, r: quadfit.boundary_points(t, r, qcfg))
        pts_ref, counts_ref = jax.block_until_ready(xla_fn(threshim, ranks))
        kw = out_rows * w
        ok_counts = np.array_equal(np.asarray(cnt)[:, 0, 0],
                                   np.asarray(counts_ref))
        ok_key = np.array_equal(
            np.asarray(key).reshape(b, kw)[:, :K],
            np.asarray(pts_ref["key"]))
        ok_pack = np.array_equal(
            np.asarray(pack2).reshape(b, kw)[:, :K],
            np.asarray(pts_ref["pack2"]))
        print(f"stageAB parity: counts={ok_counts} key={ok_key} "
              f"pack2={ok_pack}", flush=True)

        def timecall(jf, *args, iters=20):
            out = jf(*args)
            jax.block_until_ready(out)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
            t0 = time.perf_counter()
            outs = [jf(*args) for _ in range(iters)]
            _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0]
            _ = np.asarray(jax.tree_util.tree_leaves(outs[0])[0]).ravel()[0]
            return (time.perf_counter() - t0) / iters * 1e3

        t_xla = timecall(xla_fn, threshim, ranks)
        t_a = timecall(sa, threshim, ranks_img)
        t_b = timecall(sb, *planes)
        print(f"timing/frame: XLA {t_xla / B:.2f}  stageA {t_a / B:.2f}  "
              f"stageB {t_b / B:.2f}  A+B {(t_a + t_b) / B:.2f}",
              flush=True)

    # ---- full boundary_compact (both kernels in one jit) ------------------
    bc = try_compile("boundary_compact", jax.jit(
        lambda t, r: fp.boundary_compact(t, r, p_cap, K)).lower(
            threshim, ranks_img))
    if bc is not None:
        jax.block_until_ready(bc(threshim, ranks_img))
        print("boundary_compact ran", flush=True)


if __name__ == "__main__":
    main()
