"""Bitonic sort over packed int32 rows in one VMEM-resident Pallas kernel.

The cluster middle of the AprilTag pipeline is sort-bound: `lax.sort` at
K=65536-131072 costs ~1 ms/frame per call on the relay v5e and
cluster_and_fit carries three of them (blob-pair key sort, ykey extent
sort, theta sort — the role of the cub radix chain the reference runs,
apriltag_gpu.cu:806-956). XLA lowers lax.sort to a generic HBM-resident
comparator loop; a bitonic network over the (K/128, 128) int32 plane in
VMEM is the TPU-native formulation:

  - partner exchange `i XOR 2^j` is TWO dynamic rotates + one select per
    plane per step (for s = 2^j exactly one of the sublane/lane rotate
    components is nonzero, and the elements that consume a wrapped value
    never take it — bit j of their flat index routes them to the other
    rotate), the same tpu.dynamic_rotate primitive the boundary routing
    kernels (`frontend_pallas._route`) run in production;
  - the full network is log2(K)*(log2(K)+1)/2 compare-exchange steps
    (136 at K=65536) inside two nested fori_loops with TRACED shift
    amounts — an unrolled static-shift version of far fewer steps is
    known to blow up the Mosaic compile helper (see _route's docstring);
  - comparisons are lexicographic over the first `num_keys` planes,
    matching `lax.sort(ops, num_keys=m)`; remaining planes ride along as
    payload. The network is NOT stable: callers must either pass
    all-distinct key tuples or treat equal tuples as interchangeable
    (every cluster_and_fit sort passes ALL operands as keys, so ties
    mean identical tuples and stability is vacuous).

Bit-compatibility with lax.sort requires every key word to be
nonnegative and < INT32_MAX (padding to the power-of-2 network size uses
INT32_MAX sentinels that must sort strictly last). All pipeline keys are
< 2^30 (RANK_BITS pair keys <= 2^22, theta keys < 2^29, ykey < 2^20).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_I32_MAX = np.int32(2 ** 31 - 1)  # np scalar: no import-time backend init

# same scoped-VMEM note as frontend_pallas: XLA may place the batched
# outputs in VMEM when fusing, so the limit must scale past B=8
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)


def _make_sort_kernel(nrows, nops, num_keys):
    n = nrows * _LANES
    log2n = (n - 1).bit_length()

    def kernel(*refs):
        ins, outs = refs[:nops], refs[nops:]
        planes = [r[0] for r in ins]
        rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, _LANES), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (nrows, _LANES), 1)
        flat = rows * _LANES + lanes

        def exchange(k, j, planes, partner_of):
            """Compare-exchange with the i XOR 2^j partner; partner_of
            maps a plane to its partner plane via TWO dynamic rotates +
            a bit-j select (the j<7 / j>=7 phase split keeps the rotate
            on a single axis — a fused q,r flat roll would spend four
            dynamic rotates per plane because Mosaic cannot fold a
            rotate by a TRACED zero)."""
            lower = ((flat >> j) & 1) == 0
            asc = ((flat >> k) & 1) == 0
            want_min = lower == asc
            part = [partner_of(p, lower) for p in planes]
            # lexicographic strict less-than over the key planes, both ways
            o_lt = part[num_keys - 1] < planes[num_keys - 1]
            s_lt = planes[num_keys - 1] < part[num_keys - 1]
            for kk in range(num_keys - 2, -1, -1):
                eq = part[kk] == planes[kk]
                o_lt = (part[kk] < planes[kk]) | (eq & o_lt)
                s_lt = (planes[kk] < part[kk]) | (eq & s_lt)
            # NOT jnp.where(want_min, o_lt, s_lt): a vector select whose
            # BRANCH OPERANDS are i1 crashes the Mosaic compile helper
            # (exit 1, no diagnostic) — bisected r4, the single construct
            # behind every "bitonic kernels crash the helper" failure
            # since r3. Pure i1 logic compiles and is the same function.
            take = (want_min & o_lt) | (~want_min & s_lt)
            return [jnp.where(take, o, p) for o, p in zip(part, planes)]

        def inner_rows(t, carry):
            k, planes = carry
            j = k - 1 - t                       # j >= 7: sublane rotate
            q = (jnp.int32(1) << j) >> 7

            def partner_of(p, lower):
                return jnp.where(lower,
                                 pltpu.roll(p, (nrows - q) % nrows, axis=0),
                                 pltpu.roll(p, q, axis=0))

            return k, exchange(k, j, planes, partner_of)

        def inner_lanes(t, carry):
            k, planes = carry
            j = jnp.minimum(k, 7) - 1 - t       # j < 7: lane rotate
            r = jnp.int32(1) << j

            def partner_of(p, lower):
                return jnp.where(lower,
                                 pltpu.roll(p, _LANES - r, axis=1),
                                 pltpu.roll(p, r, axis=1))

            return k, exchange(k, j, planes, partner_of)

        def outer(k, planes):
            _, planes = jax.lax.fori_loop(0, jnp.maximum(k - 7, 0),
                                          inner_rows, (k, planes))
            _, planes = jax.lax.fori_loop(0, jnp.minimum(k, 7),
                                          inner_lanes, (k, planes))
            return planes

        planes = jax.lax.fori_loop(1, log2n + 1, outer, planes)
        for ref, plane in zip(outs, planes):
            ref[0] = plane

    return kernel


@functools.partial(jax.jit, static_argnames=("num_keys", "interpret"))
def sort_tpu(operands, num_keys: int = 1, interpret: bool = False):
    """Drop-in for `lax.sort(operands, dimension=1, num_keys=m)` on
    (B, K) int32 rows with nonnegative keys < INT32_MAX. Ascending over
    the first num_keys operands lexicographically; NOT stable (see
    module docstring). K is padded to the power-of-2 network size with
    INT32_MAX key sentinels that sort strictly last."""
    operands = list(operands)
    b, k = operands[0].shape
    nops = len(operands)
    n = max(2 * _LANES, 1 << (k - 1).bit_length())
    nrows = n // _LANES
    padded = []
    for i, op in enumerate(operands):
        fill = _I32_MAX if i < num_keys else jnp.int32(0)
        padded.append(jnp.pad(op, ((0, 0), (0, n - k)),
                              constant_values=fill).reshape(b, nrows,
                                                            _LANES))
    spec = pl.BlockSpec((1, nrows, _LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_sort_kernel(nrows, nops, num_keys),
        grid=(b,),
        in_specs=[spec] * nops,
        out_specs=(spec,) * nops,
        out_shape=(jax.ShapeDtypeStruct((b, nrows, _LANES), jnp.int32),)
        * nops,
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*padded)
    return [o.reshape(b, n)[:, :k] for o in out]
