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

# scoped-VMEM ceiling for the flood kernels: the default 16 MB limit is a
# compiler heuristic, not the hardware (v5e has 128 MB/core); the unrolled
# unit-pass schedules keep more roll temporaries live on the Mosaic stack
# and trip the default at (8, 400, 640) already. Same raise as
# sort_pallas/frontend_pallas.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)

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


# ---- stride-ladder fixpoint kernel -----------------------------------------
#
# Distance-doubling jumps: precompute, per axis and sign, masks saying "pixel
# p is connected to p + s*e by a straight same-component chain" for
# s in _STRIDES (built by mask doubling: c_2s(p) = c_s(p) & c_s(p + s*e)).
# One ladder sweep applies the jumps largest-first to the RUNNING minimum
# (Gauss-Seidel chaining), so a label travels up to sum(_STRIDES)+1 pixels
# per sweep along straight runs — rings and snakes converge in tens of
# sweeps instead of hundreds. The kernel iterates sweeps IN-KERNEL until a
# sweep changes nothing: propagation-only fixpoint == every pixel holds its
# component's minimum, so no XLA hook/pointer-jump rounds are needed at all
# (they cost ~8 ms/frame in 1M-index scatter/gathers).
#
# The mask build itself is pure elementwise rolls, so it runs XLA-side
# (fused, HBM-bandwidth cheap) and the kernel receives the finished bitmask
# — keeping the kernel body small enough for Mosaic's scoped-VMEM stack.
_STRIDES = (4, 32)        # fastest of the measured ladders on v5e (39.1 ms
# at B=4 vs 41.8 for (2,4,8,16,32) and 41.7 for (4,16,64)): more strides
# buy reach but pay per-sweep ops, and snake-heavy scenes are turn-bound
_DIAG_STRIDES = (4,)      # white-only diagonal chains: jumps shortcut the
# snake turns that straight ladders cannot. Measured (scripts/mb_diag.py,
# B=4 noisy scene, full label_components_flood): diag=(4,) 9.27-9.32
# ms/frame vs 9.99 for (); (2,)/(4,16)/(4,32)/(8,)/(16,) all worse or a
# wash. Parity exact incl. 1080p-decimated 540x960 on chip. (The Mosaic
# diag+matmul crash in CLAUDE.md needs a matmul fori loop in the SAME
# kernel; the flood kernel has none.)
_UNIT_PASSES = 16         # unit passes per sweep (alternating order):
# sweeps-to-fixpoint drop ~linearly with passes per sweep on the noisy
# scene (269 at 1, 59 at 8, 32 at 16 — the fixpoint is turn-bound and a
# unit pass turns one corner), amortizing the per-sweep convergence
# check + while_loop overhead. Chip A/Bs of the FULL flood at
# (8, 400, 640): up=16 beats 8 in both a sequential sweep (7.74 vs 8.40
# ms/frame) and an interleaved rerun under relay load (12.75 vs 13.49
# median); 24 no better. (An earlier kernel-only A/B favored 8 — the
# full flood amortizes the mask build differently.) sparse_diag
# (straight-only unit passes) measured WORSE (12.7 vs 8.4 ms/frame at
# up=8): diagonal white hops are the binding propagation through the
# speckled background, not an occasional correction. Needs the raised
# _VMEM_LIMIT (Mosaic keeps more roll temporaries live on the stack).
# At 540x960 (1080p decimated) multi-pass LOSES (153.5 vs 141.8 ms at
# B=4 for up=8) — ccl.label_components_flood gates the default by
# frame size.
_MAX_SWEEPS = 16384       # safety bound (never reached in practice)


def build_ladder_masks(threshim: jnp.ndarray,
                       strides: tuple = _STRIDES,
                       diag_strides: tuple = ()) -> jnp.ndarray:
    """XLA-side loop-invariant connectivity bits for (B, H, W) uint8
    threshim: bits 0..7 = the 8 unit directions (_OFFSETS order),
    8+4k+j = stride strides[k], direction j in (+x, -x, +y, -y); then 4
    bits per diagonal stride (white-only staircase-free diagonal chains:
    (+s,+s), (-s,-s), (+s,-s), (-s,+s)) — diagonal jumps shortcut the
    snaking white background that makes the fixpoint turn-bound."""
    assert 8 + 4 * len(strides) + 4 * len(diag_strides) <= 32
    v = threshim.astype(jnp.int32)
    _, h, w = v.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
    not127 = v != 127
    white = v == 255

    def roll(x, dy, dx):
        return jnp.roll(x, (-dy, -dx), axis=(1, 2))

    mask_bits = jnp.zeros(v.shape, jnp.int32)
    for k, (dy, dx, diag) in enumerate(_OFFSETS):
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
        mask_bits = mask_bits | (ok.astype(jnp.int32) << k)
    # straight-chain doubling; base +x is bit 1 ((0,1)), +y is bit 3 ((1,0)).
    # Border safety is inductive: c_1 is False in the last column/row, and
    # c_2s(p) = c_s(p) & c_s(p+s) only reads wrapped garbage where c_s(p)
    # is already False. Power-of-two chains are cached and the requested
    # strides (any powers of two) pick their bits from the cache.
    cpx = (mask_bits >> 1) & 1
    cpy = (mask_bits >> 3) & 1
    cpd = (mask_bits >> 7) & 1          # (+1, +1) white diagonal
    cpa = (mask_bits >> 6) & 1          # (+1, -1) white anti-diagonal
    chains = {1: (cpx, cpy, cpd, cpa)}
    s = 1
    need = max(list(strides) + list(diag_strides) + [1])
    while s < need:
        cpx = cpx & roll(cpx, 0, s)
        cpy = cpy & roll(cpy, s, 0)
        if diag_strides:
            cpd = cpd & roll(cpd, s, s)
            cpa = cpa & roll(cpa, s, -s)
        s *= 2
        chains[s] = (cpx, cpy, cpd, cpa)
    bit = 8
    for s in strides:
        px, py = chains[s][0], chains[s][1]
        for m in (px, roll(px, 0, -s), py, roll(py, -s, 0)):
            mask_bits = mask_bits | (m << bit)
            bit += 1
    for s in diag_strides:
        pd, pa = chains[s][2], chains[s][3]
        for m in (pd, roll(pd, -s, -s), pa, roll(pa, -s, s)):
            mask_bits = mask_bits | (m << bit)
            bit += 1
    return mask_bits


def _unit_pass(mask_bits, lab, reverse=False, ndirs=8):
    """One chained unit-neighborhood pass (masked rolls, Gauss-Seidel:
    every roll reads the running minimum). Application ORDER matters for
    convergence speed, not correctness: alternating forward/reversed
    orders lets a label turn corners in both phase orders, which cuts
    sweeps-to-fixpoint ~linearly in the number of passes per sweep
    (measured on the noisy bench scene: 269 sweeps at 1 pass/sweep,
    104 at 4, 59 at 8, 32 at 16 — /tmp-style harness now in
    scripts/mb_sweep_sched.py lineage). ndirs=4 restricts to the straight
    offsets (half the rolls; diagonal adjacency only matters for white
    8-way hops, so sparse-diagonal schedules keep most of the
    corner-turning power — see _ladder_sweep sparse_diag)."""
    m = lab
    seq = list(enumerate(_OFFSETS))[:ndirs]
    if reverse:
        seq = seq[::-1]
    for k, (dy, dx, _d) in seq:
        nl = _roll2(m, dy, dx)
        m = jnp.minimum(m, jnp.where(((mask_bits >> k) & 1) == 1, nl, _BIG))
    return m


def _ladder_sweep(mask_bits, lab, strides, diag_strides=(),
                  unit_passes=1, sparse_diag=False):
    """One chained ladder sweep: largest jumps first, then `unit_passes`
    unit 8-neighborhood passes in alternating order, each step reading
    the running minimum. More unit passes per sweep amortize the
    convergence check + loop overhead over more propagation reach (the
    percolating-background fixpoint is TURN-bound, and a unit pass turns
    one corner per application).

    sparse_diag: all unit passes but the LAST use only the 4 straight
    directions (half the rolls per pass); the final pass stays full
    8-direction. Exactness is unaffected: the fixpoint loop stops only
    when a whole sweep is the identity, which includes that full pass —
    and identity under one full 8-neighbor min pass IS the CCL fixpoint
    (no single-step improvement possible)."""
    m = lab
    jumps = []
    bit = 8
    for s in strides:
        for (dy, dx) in ((0, s), (0, -s), (s, 0), (-s, 0)):
            jumps.append((dy, dx, bit))
            bit += 1
    for s in diag_strides:
        for (dy, dx) in ((s, s), (-s, -s), (s, -s), (-s, s)):
            jumps.append((dy, dx, bit))
            bit += 1
    for dy, dx, bt in reversed(jumps):
        nl = _roll2(m, dy, dx)
        m = jnp.minimum(m, jnp.where(((mask_bits >> bt) & 1) == 1,
                                     nl, _BIG))
    for i in range(unit_passes):
        nd = 4 if (sparse_diag and i < unit_passes - 1) else 8
        m = _unit_pass(mask_bits, m, reverse=(i % 2 == 1), ndirs=nd)
    return m


def _make_fix_kernel(strides, chunk, diag_strides=(), unit_passes=1,
                     sparse_diag=False):
    # (convergence-check throttling via an in-kernel lax.cond every 8th
    # sweep measured WORSE — 45.0 vs 39-42 ms at B=4; the scalar cond costs
    # more than the per-sweep compare+reduce it skips. unit_passes > 1 is
    # the schedule that DOES work: the extra unit passes are plain rolls,
    # no cond, and sweeps-to-fixpoint drop ~linearly.)
    def _fix_kernel(mask_ref, val_in_ref, val_out_ref):
        mask_bits = mask_ref[0]

        def step(state):
            lab, _, it = state
            new = lab
            for _ in range(chunk):
                new = _ladder_sweep(mask_bits, new, strides, diag_strides,
                                    unit_passes, sparse_diag)
            return new, jnp.any(new != lab), it + 1

        lab, _, _ = jax.lax.while_loop(
            lambda s: s[1] & (s[2] < _MAX_SWEEPS), step,
            (val_in_ref[0], jnp.bool_(True), jnp.int32(0)))
        val_out_ref[0] = lab
    return _fix_kernel


@functools.partial(jax.jit, static_argnames=("strides", "chunk",
                                             "diag_strides", "unit_passes",
                                             "sparse_diag", "interpret"))
def propagate_fixpoint(threshim: jnp.ndarray, values: jnp.ndarray,
                       masks: jnp.ndarray | None = None,
                       strides: tuple = _STRIDES, chunk: int = 1,
                       diag_strides: tuple = (), unit_passes: int = 1,
                       sparse_diag: bool = False,
                       interpret: bool = False) -> jnp.ndarray:
    """Min-flood `values` (B, H, W) int32 over the same-value connectivity
    of `threshim` to FIXPOINT (in-kernel convergence loop). With values =
    flat pixel indices this is complete connected-components labeling; with
    values = per-root packed data (BIG elsewhere) it broadcasts root data to
    every component pixel — replacing 1M-index gathers with VMEM sweeps.
    Pass `masks` (build_ladder_masks output for the same strides) to share
    one mask build across several floods of the same threshim."""
    b, h, w = threshim.shape
    if masks is None:
        # XLA-side build: an in-VMEM Pallas formulation measured SLOWER
        # (10.4 vs 7.5 ms marginal at (4,400,640) — Mosaic lane rolls are
        # costly) and overflows scoped VMEM at 540x960
        masks = build_ladder_masks(threshim, strides, diag_strides)
    spec = lambda: pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fix_kernel(strides, chunk, diag_strides, unit_passes,
                         sparse_diag),
        grid=(b,),
        in_specs=[spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        input_output_aliases={1: 0},
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(masks, values)


# ---- label histogram as a one-hot MXU matmul --------------------------------
#
# Component sizes = histogram of the converged label image over the label
# space [0, n). An XLA scatter-add over (B, n) indices costs ~5 ms/frame
# (near-scalar lowering); but labels are FLAT PIXEL INDICES, so the label
# space factors as (hi, lo) = (label >> 9, label & 511) and the histogram is
# hist[s, t] = sum_k onehot(hi_k == s) * onehot(lo_k == t)  — a (512, K) x
# (K, 512) matmul per frame on the MXU (bf16 0/1 inputs, f32 accumulation:
# exact for counts < 2^24). ~67 MMACs per 2048-pixel tile; the whole frame
# is ~0.4 ms of MXU time.
_HIST_LO = 512
_HIST_TILE = 2048


def _make_hist_kernel(hi_dim):
    def _hist_kernel(lab_ref, out_ref, acc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        lab = lab_ref[:]                               # (TILE, 1) int32
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (_HIST_TILE, hi_dim), 1)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32,
                                           (_HIST_TILE, _HIST_LO), 1)
        oh_hi = ((lab >> 9) == iota_hi).astype(jnp.bfloat16)
        oh_lo = ((lab & (_HIST_LO - 1)) == iota_lo).astype(jnp.bfloat16)
        acc[:] += jax.lax.dot_general(
            oh_hi, oh_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[0] = acc[:]
    return _hist_kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def label_histogram(labels_flat: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """labels_flat (B, N) int32 with values in [0, N) -> (B, N) int32
    counts over the label space (hist[v] = #elements equal to v)."""
    b, n = labels_flat.shape
    hi_dim = -(-(-(-n // _HIST_LO)) // 8) * 8          # ceil(n/512) to x8
    npad = -(-n // _HIST_TILE) * _HIST_TILE
    if npad != n:
        # pad with label n-1; subtract the pad count from that slot after
        pad = jnp.full((b, npad - n), n - 1, jnp.int32)
        labels_flat = jnp.concatenate([labels_flat, pad], axis=1)
    col = labels_flat.reshape(b * npad, 1)
    out = pl.pallas_call(
        _make_hist_kernel(hi_dim),
        grid=(b, npad // _HIST_TILE),
        in_specs=[pl.BlockSpec((_HIST_TILE, 1),
                               lambda i, j, npad=npad: (
                                   (i * npad) // _HIST_TILE + j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hi_dim, _HIST_LO),
                               lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hi_dim, _HIST_LO), jnp.float32),
        scratch_shapes=[pltpu.VMEM((hi_dim, _HIST_LO), jnp.float32)],
        interpret=interpret,
    )(col)
    counts = out.reshape(b, hi_dim * _HIST_LO).astype(jnp.int32)
    if npad != n:
        counts = counts.at[:, n - 1].add(-(npad - n))
    return counts[:, :n]


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
