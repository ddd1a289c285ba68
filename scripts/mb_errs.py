#!/usr/bin/env python
"""Decompose the cluster 'errs' and 'smooth' stage costs at K=65536 B=8:
which op actually carries the 1.28 + 0.97 ms/frame — the windowed prefix
gathers, fit_line's transcendentals, the 7-tap rolls, or the repair
scatters? Inputs (pref, start, pos, sz_pt, errs) are concrete arrays from
the real bench scene so XLA can't fold anything away."""
import math
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

B = int(os.environ.get("MB_B", "8"))


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
    from ros_vision_tpu.ops import ccl, quadfit, threshold as thr
    from ros_vision_tpu.ops import segments as segs
    img, _ = render_scene(
        [0, 42, 311, 100],
        [simple_square_corners(300, 250, 90),
         simple_square_corners(800, 400, 110, angle_deg=20),
         simple_square_corners(450, 600, 70, angle_deg=-35),
         simple_square_corners(1000, 600, 60, angle_deg=50)],
        1280, 800, noise_sigma=1.0)
    qcfg = quadfit.QuadFitConfig(max_points=65536)
    g = jnp.asarray(np.broadcast_to(img, (B, 800, 1280)).copy())

    @jax.jit
    def setup(g):
        decim = thr.decimate2(g)
        t, _ = thr.adaptive_threshold(decim)
        _, _, ranks = ccl.label_components_flood(t)
        pts, _c = quadfit.boundary_points(t, ranks, qcfg)
        mm = quadfit.cluster_and_fit(pts, decim, qcfg,
                                     _debug_stop="moments")
        return mm

    mm = jax.block_until_ready(setup(g))
    pref = mm["pref"]
    start = mm["start"]
    pos = mm["pos"]
    sz_pt = mm["sz_pt"]
    k = pref.shape[1]
    ksz_c = jnp.minimum(20, sz_pt // 12)

    def pref_at(position, nonneg=False):
        posc = jnp.clip(position, 0, k - 1)
        gathered = segs.take1(pref, jnp.clip(start + posc, 0, k - 1))
        if nonneg:
            return gathered
        return jnp.where((position >= 0)[..., None], gathered, 0.0)

    def v_gathers(_):
        """Just the three windowed-prefix gathers + sums."""
        a = pos - ksz_c
        bpos = pos + ksz_c
        am = jnp.where(a < 0, a + sz_pt, a)
        bm = jnp.where(bpos >= sz_pt, bpos - sz_pt, bpos)
        return (pref_at(bm, nonneg=True) - pref_at(am - 1)
                + pref_at(sz_pt - 1, nonneg=True)).sum()

    def v_mwin(_):
        """Gathers + the full mwin/n algebra (new formulation)."""
        total = pref_at(sz_pt - 1, nonneg=True)
        a = pos - ksz_c
        bpos = pos + ksz_c
        am = jnp.where(a < 0, a + sz_pt, a)
        bm = jnp.where(bpos >= sz_pt, bpos - sz_pt, bpos)
        direct = am <= bm
        mwin = (pref_at(bm, nonneg=True) - pref_at(am - 1)
                + jnp.where(direct[..., None], 0.0, total))
        n = jnp.where(direct, bm - am + 1, sz_pt - am + bm + 1)
        return mwin.sum() + n.sum()

    def _mwin_full():
        total = pref_at(sz_pt - 1, nonneg=True)
        a = pos - ksz_c
        bpos = pos + ksz_c
        am = jnp.where(a < 0, a + sz_pt, a)
        bm = jnp.where(bpos >= sz_pt, bpos - sz_pt, bpos)
        direct = am <= bm
        mwin = (pref_at(bm, nonneg=True) - pref_at(am - 1)
                + jnp.where(direct[..., None], 0.0, total))
        n = jnp.where(direct, bm - am + 1, sz_pt - am + bm + 1)
        return mwin, n.astype(jnp.float32)

    def v_full(_):
        """Gathers + algebra + fit_line err (the whole errs stage)."""
        mwin, n = _mwin_full()
        return quadfit.fit_line_f32(mwin, n)["err"].sum()

    def v_fit_notheta(_):
        """fit_line with the arctan2/cos/sin replaced by rsqrt algebra."""
        mwin, n = _mwin_full()
        m = mwin
        w = jnp.where(m[..., 5] == 0, 1e-12, m[..., 5])
        ex = m[..., 0] / w
        ey = m[..., 1] / w
        cxx = m[..., 2] / w - ex * ex
        cxy = m[..., 3] / w - ex * ey
        cyy = m[..., 4] / w - ey * ey
        # eigen-direction via half-angle algebra instead of arctan2+cos/sin
        d = cyy - cxx
        r = jnp.sqrt(d * d + 4 * cxy * cxy)
        mse = 0.5 * (cxx + cyy - r)
        return (n * mse).sum() + ex.sum() + ey.sum()

    # concrete errs for the smooth variants
    mwin_c, n_c = jax.jit(lambda: _mwin_full())()
    errs_c = jax.block_until_ready(
        jax.jit(lambda m, n: quadfit.fit_line_f32(m, n)["err"])(mwin_c, n_c))

    def s_rolls(e):
        sm = jnp.zeros_like(e)
        for j in range(-3, 4):
            f = math.exp(-j * j / 2.0)
            sm = sm + f * jnp.roll(e, -j, axis=1)
        nxt = jnp.roll(sm, -1, axis=1)
        prv = jnp.roll(sm, 1, axis=1)
        return sm.sum() + ((sm > nxt) & (sm > prv)).sum()

    for name, fn, arg in [("gathers", v_gathers, errs_c),
                          ("mwin", v_mwin, errs_c),
                          ("errs_full", v_full, errs_c),
                          ("fit_notheta", v_fit_notheta, errs_c),
                          ("sm_rolls", s_rolls, errs_c)]:
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(jf(arg))
        comp = time.perf_counter() - t0
        ms = timecall(jf, arg)
        print(f"{name:12s} {ms:8.2f} ms total, {ms / B:6.3f}/frame "
              f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
