#!/usr/bin/env python
"""CPU feasibility probe for two-phase CCL: a SHORT local flood phase
(S sweeps of the production schedule) followed by a small-graph merge.

Questions answered on the real bench scene (and a high-noise variant):
  1. After S sweeps, how many distinct label values still have a
     same-value neighbor with a different label ("merge domains")?
     The merge matrix is (K, K); K must stay under a modest cap.
  2. Does transitive closure over the domain-adjacency graph reproduce
     the exact fixpoint components (min label per closure class ==
     fixpoint label)? (Sanity for the algorithm, not perf.)
  3. Roll budget: S * rolls_per_sweep vs the full fixpoint's.
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
from mb_sched2 import make_sweep_fn, FWD, REV, alt  # noqa: E402


def main():
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import threshold as thr
    corners = [simple_square_corners(300, 250, 90),
               simple_square_corners(800, 400, 110, angle_deg=20),
               simple_square_corners(450, 600, 70, angle_deg=-35),
               simple_square_corners(1000, 600, 60, angle_deg=50)]
    for noise in (1.0, 3.0):
        img, _ = render_scene([0, 42, 311, 100], corners, 1280, 800,
                              noise_sigma=noise)
        g = jnp.asarray(np.broadcast_to(img, (1, 800, 1280)).copy())
        threshim = thr.adaptive_threshold(thr.decimate2(g))[0]
        b, h, w = threshim.shape
        n = h * w

        J = ("J", (4, 32), (4,))
        sched = [J] + alt([FWD, REV], 16)
        rps = 12 + 16 * 8
        sweep = jax.jit(make_sweep_fn(sched, threshim))
        _, unit = build_masks(threshim, (4, 32), (4,))

        lab = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                               (b, n)).reshape(b, h, w)
        # full fixpoint reference
        ref = lab
        while True:
            new = sweep(ref)
            if bool(jnp.all(new == ref)):
                break
            ref = new

        lab_s = lab
        for s in range(1, 13):
            lab_s = sweep(lab_s)
            # merge domains: distinct label values that still disagree with
            # a same-value neighbor
            bad = jnp.zeros_like(lab_s, dtype=bool)
            for dy, dx, msk in unit:
                nl = jnp.roll(lab_s, (-dy, -dx), axis=(1, 2))
                bad = bad | (msk & (nl != lab_s))
            bad_labels = np.unique(np.asarray(lab_s)[np.asarray(bad)])
            K = len(bad_labels)
            # closure check (numpy, frame 0): union-find over edges between
            # bad labels
            ls = np.asarray(lab_s[0])
            parent = {v: v for v in bad_labels}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for dy, dx, msk in unit:
                nl = np.roll(ls, (-dy, -dx), axis=(0, 1))
                m = np.asarray(msk[0]) & (nl != ls)
                pairs = set(zip(ls[m].tolist(), nl[m].tolist()))
                for a, c in pairs:
                    ra, rc = find(a), find(c)
                    if ra != rc:
                        parent[max(ra, rc)] = min(ra, rc)
            # merged label per pixel = min over closure class
            root_of = {v: find(v) for v in bad_labels}
            cls_min = {}
            for v, r in root_of.items():
                cls_min[r] = min(cls_min.get(r, v), v)
            lut = np.arange(n, dtype=np.int64)
            for v, r in root_of.items():
                lut[v] = cls_min[r]
            merged = lut[ls]
            exact = bool((merged == np.asarray(ref[0])).all())
            print(f"noise={noise} S={s:2d} rolls={s*rps:5d} "
                  f"merge_domains={K:5d} closure_exact={exact}",
                  flush=True)
            if exact and K == 0:
                break


if __name__ == "__main__":
    main()
