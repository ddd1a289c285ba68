#!/usr/bin/env python
"""TPU breakdown of rank_image internals: masks-only / flood / flood+hist
/ full, plus a sweep-count probe, on the bench scene at (B, 400, 640).

Decides whether a two-phase (short local flood + small merge) CCL can pay:
if flood-to-fixpoint is the dominant share, cutting rolls 4480 -> ~800
is worth a ~1-2 ms merge phase; if hist+gather dominate, it is not.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/ros_vision_tpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def make_stage_call(h, w, stage, unit_passes, sweeps=None):
    """Truncated rank_image: stage in ('masks', 'flood', 'hist', 'full').
    sweeps: if set, run exactly that many sweeps (no fixpoint check)."""
    from ros_vision_tpu.ops import frontend_pallas as fp
    n = h * w
    hi_dim = max(8, -(-(-(-n // 512)) // 8) * 8)
    hc, gc = 8, 2
    full_kernel = fp._make_rank_kernel(h, w, hi_dim, fp.MIN_BLOB_PIXELS,
                                       fp.STRIDES, (), unit_passes, hc, gc)

    def kernel(thresh_ref, rank_ref, hist_ref, lab_ref):
        if stage == "full":
            full_kernel(thresh_ref, rank_ref, hist_ref, lab_ref)
            return
        v = thresh_ref[0].astype(jnp.int32)
        if stage == "copy":
            rank_ref[0, :, :] = v
            hist_ref[:] = jnp.zeros_like(hist_ref)
            lab_ref[:] = v
            return
        if stage == "masks":
            mask = fp._build_masks(v, fp.STRIDES, ())
            rank_ref[0, :, :] = mask
            hist_ref[:] = jnp.zeros_like(hist_ref)
            lab_ref[:] = mask
            return
        if sweeps is None:
            lab = fp._flood(v, fp.STRIDES, (), unit_passes)
        else:
            mask = fp._build_masks(v, fp.STRIDES, ())
            init = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
                    + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
            lab = jax.lax.fori_loop(
                0, sweeps,
                lambda i, m: fp._ladder_sweep(mask, m, fp.STRIDES, (),
                                              unit_passes), init)
        lab_ref[:] = lab
        if stage == "flood":
            rank_ref[0, :, :] = lab
            hist_ref[:] = jnp.zeros_like(hist_ref)
            return
        # hist
        hist_ref[:] = jnp.zeros_like(hist_ref)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_dim, hc * w), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (512, hc * w), 0)

        def hist_chunk(i, _):
            rows = jnp.concatenate(
                [lab_ref[pl.ds(i * hc + r, 1), :] for r in range(hc)],
                axis=1)
            oh_hi = ((rows >> 9) == iota_hi).astype(jnp.bfloat16)
            oh_lo = ((rows & 511) == iota_lo).astype(jnp.bfloat16)
            hist_ref[:] += jax.lax.dot_general(
                oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, h // hc, hist_chunk, 0)
        rank_ref[0, :, :] = hist_ref[0, 0].astype(jnp.int32) + lab

    spec = lambda: pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),  # noqa
                                memory_space=pltpu.VMEM)

    @jax.jit
    def call(threshim):
        b = threshim.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[spec()],
            out_specs=spec(),
            out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
            scratch_shapes=[pltpu.VMEM((hi_dim, 512), jnp.float32),
                            pltpu.VMEM((h, w), jnp.int32)],
            compiler_params=fp._VMEM_LIMIT,
        )(threshim)

    return call


def main():
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
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
    h, w = threshim.shape[1], threshim.shape[2]

    up = 16
    jobs = [("copy", None), ("masks", None), ("flood", None),
            ("hist", None), ("full", None),
            ("flood_s4", 4), ("flood_s8", 8)]
    calls = {}
    for name, sw in jobs:
        stage = name.split("_")[0]
        try:
            c = make_stage_call(h, w, stage, up, sweeps=sw)
            jax.block_until_ready(c(threshim))
            calls[name] = c
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
    best = {k: float("inf") for k in calls}
    for _ in range(2):
        for k, c in calls.items():
            best[k] = min(best[k], timecall(c, threshim))
    for k, t in best.items():
        print(f"{k:10s}: {t:7.2f} ms ({t/B:5.2f}/frame)", flush=True)


if __name__ == "__main__":
    main()
