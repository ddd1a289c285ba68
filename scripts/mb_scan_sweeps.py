#!/usr/bin/env python
"""CPU experiment: sweeps-to-fixpoint for SCAN-based flood CCL sweeps.

The flood kernel's stride ladder is reach-bound (~73 px/sweep along
straight runs); a full segmented row+col cummin per sweep is TURN-bound
(unbounded reach within a monotone run). This counts fixpoint sweeps for
scan-sweep variants on the real bench threshold image (same scene as
mb_sweep_sched.py, which measured the ladder at 287 and ladder+diag at
~207). If scan sweeps land under ~70 the in-kernel Hillis-Steele version
(~4x the per-sweep roll count of the ladder) wins overall.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from scripts.mb_sweep_sched import build_masks, _BIG  # noqa: E402
from ros_vision_tpu.ops.ccl import _line_cummin  # noqa: E402


def make_sweep(threshim, strides=(), diag_strides=(), row=True, col=True):
    jumps, unit = build_masks(threshim, strides, diag_strides)

    def sweep(lab):
        m = lab
        if row:
            m = _line_cummin(m, threshim, axis=2)
        if col:
            m = _line_cummin(m, threshim, axis=1)
        for dy, dx, msk in jumps:
            nl = jnp.roll(m, (-dy, -dx), axis=(1, 2))
            m = jnp.minimum(m, jnp.where(msk, nl, _BIG))
        for dy, dx, msk in unit:
            nl = jnp.roll(m, (-dy, -dx), axis=(1, 2))
            m = jnp.minimum(m, jnp.where(msk, nl, _BIG))
        return m
    return jax.jit(sweep)


def run_fix(threshim, max_sweeps=2000, **kw):
    b, h, w = threshim.shape
    lab = jnp.broadcast_to(jnp.arange(h * w, dtype=jnp.int32),
                           (b, h * w)).reshape(b, h, w)
    js = make_sweep(threshim, **kw)
    k = 0
    while k < max_sweeps:
        new = js(lab)
        k += 1
        if bool(jnp.all(new == lab)):
            break
        lab = new
    return k, lab


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
    g = jnp.asarray(np.broadcast_to(img, (1, 800, 1280)).copy())
    threshim = thr.adaptive_threshold(thr.decimate2(g))[0]

    ref = None
    variants = [
        ("ladder (4,32)+diag(4)   [current]",
         dict(strides=(4, 32), diag_strides=(4,), row=False, col=False)),
        ("scan row+col only", dict()),
        ("scan row+col + diag(4)", dict(diag_strides=(4,))),
        ("scan row+col + diag(4,32)", dict(diag_strides=(4, 32))),
        ("scan row only + ladder(32)+diag(4)",
         dict(strides=(32,), diag_strides=(4,), col=False)),
    ]
    for name, kw in variants:
        t0 = time.time()
        k, lab = run_fix(threshim, **kw)
        if ref is None:
            ref = lab
        ok = bool(jnp.all(lab == ref))
        print(f"{name:42s} sweeps={k:4d}  match={ok} "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
