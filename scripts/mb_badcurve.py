#!/usr/bin/env python
"""CPU probe: bad-pixel/domain counts per sweep under the PRODUCTION
flood schedule (strides (4,32) + unit_passes alternating), to size the
two-phase CCL caps (phase-1 stop condition 'bad pixels <= CAP') and
estimate sweep savings.

bad pixel = pixel with a masked neighbor carrying a different label.
K (merge domains) = distinct labels among bad pixels (edges only ever
touch bad pixels, so K <= bad count).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from ros_vision_tpu.ops import frontend_pallas as fp  # noqa: E402

UP = int(os.environ.get("MB_UP", "16"))


def main():
    from ros_vision_tpu.apriltag.render import (render_scene,
                                                simple_square_corners)
    from ros_vision_tpu.ops import threshold as thr
    corners = [simple_square_corners(300, 250, 90),
               simple_square_corners(800, 400, 110, angle_deg=20),
               simple_square_corners(450, 600, 70, angle_deg=-35),
               simple_square_corners(1000, 600, 60, angle_deg=50)]
    for noise in (1.0, 3.0, 4.0):
        img, _ = render_scene([0, 42, 311, 100], corners, 1280, 800,
                              noise_sigma=noise)
        g = jnp.asarray(img[None])
        threshim = thr.adaptive_threshold(thr.decimate2(g))[0]
        v = threshim[0].astype(jnp.int32)
        h, w = v.shape

        # XLA equivalents of the kernel helpers (pltpu.roll -> jnp.roll)
        import unittest.mock as um
        with um.patch.object(fp.pltpu, "roll",
                             lambda x, s, axis: jnp.roll(x, s, axis=axis)):
            mask = fp._build_masks(v, fp.STRIDES, ())
            init = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
                    + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))

            @jax.jit
            def sweep(lab):
                return fp._ladder_sweep(mask, lab, fp.STRIDES, (), UP)

            @jax.jit
            def badmask(lab):
                bad = jnp.zeros_like(lab, dtype=bool)
                for k, (dy, dx, _d) in enumerate(fp._OFFSETS):
                    nl = jnp.roll(lab, (-dy, -dx), axis=(0, 1))
                    bad = bad | ((((mask >> k) & 1) == 1) & (nl != lab))
                return bad

            lab = init
            s = 0
            rows = []
            while True:
                new = sweep(lab)
                s += 1
                done = bool(jnp.all(new == lab))
                lab = new
                bad = badmask(lab)
                nbad = int(jnp.sum(bad))
                klabels = len(np.unique(np.asarray(lab)[np.asarray(bad)]))
                rows.append((s, nbad, klabels))
                if done or s > 120:
                    break
            fix = s
            print(f"noise={noise} fixpoint_sweeps={fix} (up={UP})",
                  flush=True)
            for s, nbad, k in rows:
                if nbad == 0 and s < fix - 1:
                    continue
                mark = ""
                for cap in (512, 1024, 2048):
                    prev = rows[s - 2][1] if s >= 2 else 10**9
                    if nbad <= cap < prev:
                        mark += f" <=cap{cap}"
                print(f"  S={s:3d} bad_px={nbad:6d} K={k:5d}{mark}",
                      flush=True)


if __name__ == "__main__":
    main()
