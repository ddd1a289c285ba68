#!/usr/bin/env python
"""CPU experiment: sweeps-to-fixpoint for flood CCL schedule variants.

The Pallas flood kernel's cost is sweep-bound (287 sweeps on the noisy
bench scene with the (4,32) straight-stride ladder). This script counts
fixpoint sweeps for candidate schedules on the real bench threshold image
— pure JAX-CPU, no TPU — to pick the schedule worth porting into the
kernel. Variants: straight-stride ladders, added diagonal chains (white
8-connectivity staircase shortcuts), and a half-res multigrid seed.
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

_BIG = 2 ** 30
_OFFSETS = [
    (0, -1, False), (0, 1, False), (-1, 0, False), (1, 0, False),
    (-1, -1, True), (-1, 1, True), (1, -1, True), (1, 1, True),
]


def build_masks(threshim, strides, diag_strides=()):
    """Connectivity bits: 0..7 unit dirs; then 4 bits per straight stride
    (+x,-x,+y,-y); then 4 bits per diag stride (white only):
    (+x+y, -x-y, +x-y, -x+y)."""
    v = threshim.astype(jnp.int32)
    _, h, w = v.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
    not127 = v != 127
    white = v == 255

    def roll(x, dy, dx):
        return jnp.roll(x, (-dy, -dx), axis=(1, 2))

    bits = []
    for (dy, dx, diag) in _OFFSETS:
        nv = roll(v, dy, dx)
        ok = not127 & (nv == v)
        if diag:
            ok &= white
        if dy == -1:
            ok &= rows > 0
        elif dy == 1:
            ok &= rows < h - 1
        if dx == -1:
            ok &= cols > 0
        elif dx == 1:
            ok &= cols < w - 1
        bits.append(ok)
    cpx = bits[1]
    cpy = bits[3]
    # diag base chains: (+1,+1) is bits[7]; (+1,-1) is bits[6]
    cpd = bits[7]
    cpa = bits[6]
    chains = {1: (cpx, cpy, cpd, cpa)}
    s = 1
    while s < max(list(strides) + list(diag_strides) + [1]):
        cpx = cpx & roll(cpx, 0, s)
        cpy = cpy & roll(cpy, s, 0)
        cpd = cpd & roll(cpd, s, s)
        cpa = cpa & roll(cpa, s, -s)
        s *= 2
        chains[s] = (cpx, cpy, cpd, cpa)
    jumps = []   # (dy, dx, mask)
    for s in strides:
        px, py, _, _ = chains[s]
        jumps += [(0, s, px), (0, -s, roll(px, 0, -s)),
                  (s, 0, py), (-s, 0, roll(py, -s, 0))]
    for s in diag_strides:
        _, _, pd, pa = chains[s]
        jumps += [(s, s, pd), (-s, -s, roll(pd, -s, -s)),
                  (s, -s, pa), (-s, s, roll(pa, -s, s))]
    unit = [(dy, dx, m) for (dy, dx, _), m in zip(_OFFSETS, bits)]
    return jumps, unit


def sweep(lab, jumps, unit):
    m = lab
    for dy, dx, msk in jumps:
        nl = jnp.roll(m, (-dy, -dx), axis=(1, 2))
        m = jnp.minimum(m, jnp.where(msk, nl, _BIG))
    for dy, dx, msk in unit:
        nl = jnp.roll(m, (-dy, -dx), axis=(1, 2))
        m = jnp.minimum(m, jnp.where(msk, nl, _BIG))
    return m


def run_fixpoint(threshim, strides, diag_strides=(), seed=None, max_sweeps=2000):
    b, h, w = threshim.shape
    n = h * w
    jumps, unit = build_masks(threshim, strides, diag_strides)
    if seed is not None:
        lab = seed          # caller provides init labels (any value space)
    else:
        lab = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                               (b, n)).reshape(b, h, w)
    js = jax.jit(lambda x: sweep(x, jumps, unit))
    k = 0
    while k < max_sweeps:
        new = js(lab)
        k += 1
        if bool(jnp.all(new == lab)):
            break
        lab = new
    return k, lab


def coarsen(threshim):
    b, h, w = threshim.shape
    q = threshim.reshape(b, h // 2, 2, w // 2, 2)
    allw = (q == 255).all(axis=(2, 4))
    allb = (q == 0).all(axis=(2, 4))
    return jnp.where(allw, jnp.uint8(255),
                     jnp.where(allb, jnp.uint8(0), jnp.uint8(127)))


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
        ("straight (4,32)  [current]", dict(strides=(4, 32))),
        ("straight (4,32) + diag (4,)", dict(strides=(4, 32),
                                             diag_strides=(4,))),
        ("straight (4,32) + diag (4,16)", dict(strides=(4, 32),
                                               diag_strides=(4, 16))),
        ("straight (8,64) + diag (8,64)", dict(strides=(8, 64),
                                               diag_strides=(8, 64))),
        ("straight (4,16,64) + diag (4,16,64)",
         dict(strides=(4, 16, 64), diag_strides=(4, 16, 64))),
        ("diag only (4,32)", dict(strides=(), diag_strides=(4, 32))),
    ]
    for name, kw in variants:
        t0 = time.time()
        k, lab = run_fixpoint(threshim, **kw)
        if ref is None:
            ref = lab
        ok = bool(jnp.all(lab == ref))
        print(f"{name:42s} sweeps={k:4d}  match={ok} "
              f"({time.time()-t0:.0f}s)", flush=True)

    # multigrid: coarse fixpoint on uniform-2x2 graph seeds the fine flood;
    # coarse init labels = min-pooled fine flat indices (fine label space)
    ct = coarsen(threshim)
    b, h, w = threshim.shape
    fine_iota = jnp.broadcast_to(jnp.arange(h * w, dtype=jnp.int32),
                                 (b, h * w)).reshape(b, h, w)
    coarse_init = fine_iota.reshape(b, h // 2, 2, w // 2, 2).min(axis=(2, 4))
    t0 = time.time()
    kc, cl = run_fixpoint(ct, strides=(4, 32), seed=coarse_init)
    up = jnp.broadcast_to(cl[:, :, None, :, None],
                          cl.shape[:1] + (cl.shape[1], 2, cl.shape[2], 2)
                          ).reshape(threshim.shape)
    ct_up = jnp.broadcast_to(ct[:, :, None, :, None],
                             ct.shape[:1] + (ct.shape[1], 2, ct.shape[2], 2)
                             ).reshape(threshim.shape)
    seed = jnp.minimum(fine_iota, jnp.where(ct_up != 127, up, _BIG))
    kf, lab = run_fixpoint(threshim, strides=(4, 32), seed=seed)
    ok = bool(jnp.all(lab == ref))
    print(f"{'multigrid seed (coarse+fine)':42s} sweeps={kc}+{kf}  "
          f"match={ok} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
