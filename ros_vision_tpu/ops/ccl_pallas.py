"""Pallas label-propagation kernel for connected components.

The XLA CCL (ops/ccl.py) pays HBM round-trips per propagation sweep;
this kernel keeps the whole label image in VMEM and runs many masked
8-neighbor min sweeps per invocation — each sweep is pure VPU work
(rolls + selects), so hundreds of sweeps cost milliseconds instead of
seconds. Connectivity semantics match ops/ccl.py exactly (4-way for black,
8-way for white, 127 isolated).

Used as the inner accelerator of ccl.label_components_hybrid: the outer XLA
loop adds scatter-min hooking + pointer jumping and the convergence
guarantee; the kernel collapses everything with bounded shape diameter
first, so the outer loop usually runs once or twice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2 ** 30   # python literal: jnp scalars would be captured constants

# (dy, dx, diagonal) — same table as ops/ccl.py
_OFFSETS = [
    (0, -1, False), (0, 1, False), (-1, 0, False), (1, 0, False),
    (-1, -1, True), (-1, 1, True), (1, -1, True), (1, 1, True),
]


def _roll2(x, dy, dx):
    """out[y, x] = in[y+dy, x+dx] with wrap (masked by the caller)."""
    if dy:
        x = pltpu.roll(x, (-dy) % x.shape[0], axis=0)
    if dx:
        x = pltpu.roll(x, (-dx) % x.shape[1], axis=1)
    return x


def _kernel(sweeps_ref, thresh_ref, lab_in_ref, lab_out_ref):
    v = thresh_ref[0].astype(jnp.int32)          # (H, W)
    h, w = v.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    not127 = v != 127
    white = v == 255

    # loop-invariant eligibility packed into ONE int32 bitmask array
    # (8 separate bool masks get hoisted out of the loop and blow the
    # 16 MB scoped-VMEM limit at larger frame sizes)
    mask_bits = jnp.zeros(v.shape, jnp.int32)
    for k, (dy, dx, diag) in enumerate(_OFFSETS):
        nv = _roll2(v, dy, dx)
        ok = not127 & (nv == v)
        if diag:
            ok &= white
        # exclude wrapped borders
        if dy == -1:
            ok &= rows > 0
        elif dy == 1:
            ok &= rows < h - 1
        if dx == -1:
            ok &= cols > 0
        elif dx == 1:
            ok &= cols < w - 1
        mask_bits = mask_bits | (ok.astype(jnp.int32) << k)

    def sweep(_, lab):
        m = lab
        for k, (dy, dx, _d) in enumerate(_OFFSETS):
            nl = _roll2(lab, dy, dx)
            ok = ((mask_bits >> k) & 1) == 1
            m = jnp.minimum(m, jnp.where(ok, nl, _BIG))
        return m

    # runtime sweep count: the hybrid loop runs a deep first round and
    # shallow verification rounds without recompiling
    lab_out_ref[0] = jax.lax.fori_loop(0, sweeps_ref[0], sweep,
                                       lab_in_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def propagate(threshim: jnp.ndarray, labels: jnp.ndarray,
              n_sweeps=128, interpret: bool = False) -> jnp.ndarray:
    """threshim (B, H, W) uint8; labels (B, H, W) int32 -> propagated
    labels after n_sweeps (scalar, may be traced) masked neighbor-min
    sweeps (VMEM-resident)."""
    b, h, w = threshim.shape
    spec = lambda: pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        # alias labels in/out: halves the label buffering (the 16 MB scoped
        # VMEM limit binds at >=540x960 frames otherwise)
        input_output_aliases={2: 0},
        interpret=interpret,
    )(jnp.asarray(n_sweeps, jnp.int32).reshape(1), threshim, labels)
