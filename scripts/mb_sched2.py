#!/usr/bin/env python
"""CPU schedule search for the flood-CCL kernel: minimize ROLL-EQUIVALENTS
to fixpoint.

Chip-fitted cost model (mb_unitpasses A/B, (8,400,640)):
  ms/frame ~= 1.55e-3 * rolls_per_sweep * sweeps + 0.0244 * sweeps + fixed
i.e. 1 sweep of overhead ~ 15.7 rolls. The up=8 vs up=16 data point shows
total unit rolls to fixpoint is nearly invariant (~4480) under alternating
fwd/rev orders — the fixpoint is bound by the propagation paths' CORNER
count and one chained unit pass turns ~1 corner per path. Candidates here
try passes that turn MORE than one corner per application (rotational
direction orders following curved paths, doubled-direction passes) and
jump phases interleaved between passes.

Schedule DSL: a sweep is a list of phases:
  ("J", strides, diag_strides)  — jump rolls (4 per stride each kind)
  (d0, d1, ...)                 — chained unit pass over direction indices
                                  into _OFFSETS (repeats allowed)
Exactness: any schedule whose sweep contains at least one FULL 8-direction
unit pass is exact at fixpoint (identity under a full unit pass == CCL
fixpoint); every candidate here satisfies that.
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

from mb_sweep_sched import build_masks, _BIG  # noqa: E402

# _OFFSETS order (matches ccl_pallas._OFFSETS):
# 0:W 1:E 2:N 3:S 4:NW 5:NE 6:SW 7:SE
FWD = (0, 1, 2, 3, 4, 5, 6, 7)
REV = tuple(reversed(FWD))
# rotational orders: follow a curving path (consecutive dirs differ by 45deg)
CW = (2, 5, 1, 7, 3, 6, 0, 4)    # N NE E SE S SW W NW
CCW = tuple(reversed(CW))
CW2 = (1, 7, 3, 6, 0, 4, 2, 5)   # CW rotated to start at E
CCW2 = tuple(reversed(CW2))

C_ROLL = 1.55e-3   # ms per roll (chip fit)
C_SWEEP = 0.0244   # ms per sweep (chip fit)


def phase_rolls(p):
    if p[0] == "J":
        return 4 * (len(p[1]) + len(p[2]))
    return len(p)


def make_sweep_fn(schedule, threshim):
    # build masks once for the union of strides used
    all_s, all_d = set(), set()
    for p in schedule:
        if p[0] == "J":
            all_s |= set(p[1]); all_d |= set(p[2])
    jumps, unit = build_masks(threshim, tuple(sorted(all_s)) or (1,),
                              tuple(sorted(all_d)))
    # index jump rolls by (kind, stride): build_masks emits 4 rolls/stride
    # in order: strides then diag_strides
    jmap = {}
    i = 0
    for s in sorted(all_s):
        jmap[("s", s)] = jumps[i:i + 4]; i += 4
    for s in sorted(all_d):
        jmap[("d", s)] = jumps[i:i + 4]; i += 4

    def sweep(lab):
        m = lab
        for p in schedule:
            if p[0] == "J":
                rolls = []
                for s in p[1]:
                    rolls += jmap[("s", s)]
                for s in p[2]:
                    rolls += jmap[("d", s)]
            else:
                rolls = [unit[d] for d in p]
            for dy, dx, msk in rolls:
                nl = jnp.roll(m, (-dy, -dx), axis=(1, 2))
                m = jnp.minimum(m, jnp.where(msk, nl, _BIG))
        return m

    return sweep


def run(schedule, threshim, max_sweeps=3000):
    b, h, w = threshim.shape
    n = h * w
    lab = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                           (b, n)).reshape(b, h, w)
    js = jax.jit(make_sweep_fn(schedule, threshim))
    k = 0
    while k < max_sweeps:
        new = js(lab)
        k += 1
        if bool(jnp.all(new == lab)):
            break
        lab = new
    return k, lab


def alt(orders, n):
    """n unit passes cycling through the given orders."""
    return [orders[i % len(orders)] for i in range(n)]


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

    J = ("J", (4, 32), (4,))
    J4 = ("J", (4,), (4,))
    cands = [
        ("current up=16 fwd/rev", [J] + alt([FWD, REV], 16)),
        ("up=16 rot cw/ccw", [J] + alt([CW, CCW], 16)),
        ("up=16 rot cw/ccw/cw2/ccw2", [J] + alt([CW, CCW, CW2, CCW2], 16)),
        ("up=16 fwd/rev/cw/ccw", [J] + alt([FWD, REV, CW, CCW], 16)),
        ("up=8 rot cw/ccw", [J] + alt([CW, CCW], 8)),
        ("up=12 rot cw/ccw", [J] + alt([CW, CCW], 12)),
        ("up=24 rot cw/ccw", [J] + alt([CW, CCW], 24)),
        ("up=16 interleave J4 every 4",
         [J] + sum(([*alt([CW, CCW], 4), J4] for _ in range(4)), [])[:-1]),
        ("up=16 cw doubled (12-roll)",
         [J] + alt([CW + CW[:4], CCW + CCW[:4]], 16)),
    ]
    ref = None
    rows = []
    for name, sched in cands:
        rps = sum(phase_rolls(p) for p in sched)
        t0 = time.time()
        k, lab = run(sched, threshim)
        if ref is None:
            ref = lab
        ok = bool(jnp.all(lab == ref))
        est = (rps * k) * C_ROLL + k * C_SWEEP
        rows.append((est, name, k, rps, ok, time.time() - t0))
        print(f"{name:34s} sweeps={k:4d} rolls/sweep={rps:3d} "
              f"total={k*rps:6d} est={est:6.2f} ms/frame match={ok} "
              f"({time.time()-t0:.0f}s)", flush=True)
    print("\nbest:")
    for est, name, k, rps, ok, _ in sorted(rows)[:3]:
        print(f"  {est:6.2f} ms  {name} (sweeps={k}, rolls/sweep={rps})")


if __name__ == "__main__":
    main()
