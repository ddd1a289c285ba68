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


if __name__ == "__main__":
    main()
