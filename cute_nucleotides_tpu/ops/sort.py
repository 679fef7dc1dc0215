"""Device bitonic sort for u32 key pairs — the platform sort replacement
behind :func:`.kmer.kmer_counts` (r05).

`jax.lax.sort` costs ~0.1 ns * N log N on this chip (measured, DESIGN §
"kmer_counts is the platform sort primitive") and is the entire cost of
k-mer counting.  This module implements the full bitonic network with a
**layout-switching** schedule so that every compare-exchange is a
cross-ROW (sublane-dimension) vector op — TPUs have no cheap lane
shuffle, so the classic in-register bitonic is not expressible; instead:

* elements live in a row-major matrix ``X[r, c]`` (``n = R * C``,
  ``C = 1024``): a stage at stride ``j >= C`` pairs rows ``r, r + j/C``
  of ``X`` — a reshape ``(R, L) -> (R/2g, 2, g, L)`` and one vectorized
  compare-exchange;
* a stage at stride ``j < C`` pairs COLUMNS ``c, c + j`` — the same
  cross-row op on the transposed matrix ``Y = X^T``.

One bitonic phase ``k`` (merging sorted runs of ``k/2``) is then: its
``>= C`` stages in one Pallas pass over full-height lane strips of
``X`` (kernel K1), one transpose, its ``< C`` stages in one Pallas pass
over ``Y`` (kernel K2), one transpose back — 2 kernel passes + 2
transposes per phase instead of one HBM sweep per stage.  The first
``log C`` phases are exactly "sort each row, directions alternating",
which the batched ``lax.sort`` primitive does at 7.7x the flat sort's
rate (measured, same DESIGN section) — so the network starts from
row-sorted data and only ``log(N/C)`` phases run as kernels.

Orderings: Mosaic has no unsigned vector compare (DESIGN §4), so keys
are pre-mapped through the order isomorphism ``u32 -> i32: x ^ 2^31``
once at the boundary; all device compares are signed.  Direction bits
come from the element index (asc iff ``i & k == 0``), which in every
stage run here depends only on coordinates that are uniform across the
paired axis — rows of X (K1) / lanes of Y (K2) — so they are iota masks,
never data movement.

The reference has no sort (its API stops at the codec); this is
TPU-native infrastructure for the counting layer
(reference README.md:139-151 motivates k-mer workloads as the codec's
downstream consumer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sort_pairs", "BITONIC_COLS", "BITONIC_MAX_N"]

#: matrix width of the layout-switching network (the batched-row-sort
#: width for the init phases; 1024 measured fastest per element)
BITONIC_COLS = 1024

#: largest padded n the kernel path accepts: R = n / C full-height lane
#: strips must fit VMEM (~16 MiB/core) with in/out aliasing
BITONIC_MAX_N = 1 << 23

_FLIP = jnp.uint32(0x80000000)


def _to_ord(x: jax.Array) -> jax.Array:
    """u32 -> order-isomorphic i32 (unsigned order == signed order)."""
    return jax.lax.bitcast_convert_type(x ^ _FLIP, jnp.int32)


def _from_ord(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.uint32) ^ _FLIP


def _stage_rows(hi, lo, g, desc):
    """One stage pairing rows ``r`` and ``r + g`` inside 2g-row blocks.

    ``desc`` (bool, same shape) must be uniform across each pair — true
    here because the direction bit of phase ``k`` sits strictly above
    every stage-stride bit.

    Formulation note (r05 hardware A/B): this 4-way-select + stack form
    measured ~16 lane-ops/element/stage on v5e; an XOR-swap variant
    (compare halves once, one broadcast XOR swaps both halves, no stack)
    measured ~6% SLOWER despite ~3x fewer arithmetic ops — the stage
    cost is Mosaic's materialization of the (blocks, 2, g, L) reshape
    and half-slices, i.e. data movement, not ALU.  That is why the
    network cannot beat `lax.sort` (see `sort_pairs`).
    """
    R, L = hi.shape
    blocks = R // (2 * g)

    def rs(x):
        return x.reshape(blocks, 2, g, L)

    h4, l4, d4 = rs(hi), rs(lo), rs(desc)
    ah, bh = h4[:, 0], h4[:, 1]
    al, bl = l4[:, 0], l4[:, 1]
    gt = (ah > bh) | ((ah == bh) & (al > bl))
    sw = gt != d4[:, 0]
    oh1 = jnp.where(sw, bh, ah)
    ol1 = jnp.where(sw, bl, al)
    oh2 = jnp.where(sw, ah, bh)
    ol2 = jnp.where(sw, al, bl)
    hi = jnp.stack([oh1, oh2], axis=1).reshape(R, L)
    lo = jnp.stack([ol1, ol2], axis=1).reshape(R, L)
    return hi, lo


def _k1_kernel(q: int, log_c: int, R: int):
    """X-layout stages of phase ``k = 2^q``: strides ``2^(q-1) .. C``.

    The block is a full-height lane strip ``(R, Lb)``; the direction bit
    ``i & 2^q`` depends only on the row (``q > log_c``)."""

    def kernel(hi_ref, lo_ref, ho_ref, lo_o_ref):
        hi, lo = hi_ref[:], lo_ref[:]
        L = hi.shape[1]
        r = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        desc = ((r >> (q - log_c)) & 1) == 1
        for jl in range(q - 1, log_c - 1, -1):
            hi, lo = _stage_rows(hi, lo, 1 << (jl - log_c), desc)
        ho_ref[:] = hi
        lo_o_ref[:] = lo

    return kernel


def _k2_kernel(q: int, log_c: int, C: int, Lb: int):
    """Y-layout stages of phase ``k = 2^q``: strides ``C/2 .. 1``.

    The block is a ``(C, Lb)`` strip of ``Y = X^T``; Y's rows are X's
    columns, so every stride-``j < C`` pair is a cross-row op.  The
    direction bit depends only on X's row == Y's LANE, read off a lane
    iota offset by the grid position."""

    def kernel(hi_ref, lo_ref, ho_ref, lo_o_ref):
        hi, lo = hi_ref[:], lo_ref[:]
        off = pl.program_id(0) * Lb
        lane = off + jax.lax.broadcasted_iota(jnp.int32, (C, Lb), 1)
        desc = ((lane >> (q - log_c)) & 1) == 1
        for jl in range(log_c - 1, -1, -1):
            hi, lo = _stage_rows(hi, lo, 1 << jl, desc)
        ho_ref[:] = hi
        lo_o_ref[:] = lo

    return kernel


def _strip_call(kernel, hi, lo, Lb: int, interpret: bool):
    R, C = hi.shape
    if C % Lb:
        raise ValueError(f"strip width {Lb} does not divide lane count {C}")
    # the unrolled stage loop keeps several block-sized temporaries live;
    # the default 16 MiB scoped-vmem budget rejects full-height strips at
    # counting scale, so raise it explicitly (v5e VMEM is larger; the
    # blocks themselves are 4 x R*Lb*4 bytes)
    params = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=(C // Lb,),
        in_specs=[
            pl.BlockSpec((R, Lb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Lb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, Lb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Lb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), jnp.int32),
            jax.ShapeDtypeStruct((R, C), jnp.int32),
        ],
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
        compiler_params=params,
    )(hi, lo)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sort_pairs_bitonic(hi, lo, *, interpret: bool = False):
    from .pallas_kernels import _auto_interpret

    interpret = _auto_interpret(interpret)
    n0 = hi.size
    log_n = max((n0 - 1).bit_length(), BITONIC_COLS.bit_length())
    n = 1 << log_n
    # widen the matrix beyond BITONIC_COLS when needed to cap R at 2048:
    # K1's full-height (R, 128) strips must fit the ~16 MiB scoped VMEM
    # with Mosaic's double buffering (R=4096 measured 36 KiB OVER the
    # limit on v5e), and the TPU lowering requires the lane block be a
    # 128-multiple or the full width, so the budget cannot be met by
    # narrowing strips below 128
    C = max(BITONIC_COLS, n // 2048)
    log_c = C.bit_length() - 1
    R = n // C
    hi = hi.reshape(-1)
    lo = lo.reshape(-1)
    if n > n0:
        padv = jnp.full(n - n0, 0xFFFFFFFF, jnp.uint32)
        hi = jnp.concatenate([hi, padv])
        lo = jnp.concatenate([lo, padv])
    hx = _to_ord(hi).reshape(R, C)
    lx = _to_ord(lo).reshape(R, C)
    # init: phases 2 .. C == sort each row, directions alternating by row
    # parity (asc iff i & C == 0 iff r even) — the fast batched primitive
    hx, lx = jax.lax.sort((hx, lx), dimension=1, num_keys=2)
    odd = (jnp.arange(R, dtype=jnp.int32) & 1) == 1
    hx = jnp.where(odd[:, None], hx[:, ::-1], hx)
    lx = jnp.where(odd[:, None], lx[:, ::-1], lx)
    # strip widths: full-height (rows, Lb) in+out blocks, aliased.  TPU
    # lowering requires the lane block be a multiple of 128 OR the full
    # lane count; rows are capped at 2048 above so (2048, 128) strips
    # plus the stage-loop temporaries stay inside the raised scoped-VMEM
    # budget (4096-row strips measured OVER even with the raise)
    Lb = C if C <= 128 else 128
    Lb2 = R if R <= 128 else 128
    for q in range(log_c + 1, log_n + 1):
        hx, lx = _strip_call(
            _k1_kernel(q, log_c, R), hx, lx, Lb, interpret
        )
        hy, ly = hx.T, lx.T
        hy, ly = _strip_call(
            _k2_kernel(q, log_c, C, Lb2), hy, ly, Lb2, interpret
        )
        hx, lx = hy.T, ly.T
    hs = _from_ord(hx.reshape(-1))
    ls = _from_ord(lx.reshape(-1))
    return hs[:n0], ls[:n0]


def sort_pairs(
    hi: jax.Array,
    lo: jax.Array,
    *,
    prefer: str = "lax",
    interpret: bool = False,
):
    """Sort u32 pairs by ``(hi, lo)`` ascending (unsigned, lexicographic):
    -> (hi_sorted, lo_sorted), both u32[n].

    ``prefer="lax"`` (default) uses ``jax.lax.sort`` — the r05 hardware
    A/B (tools/tune_sort.py) measured the full layout-switching bitonic
    at 10.3 ms vs lax.sort's 9.8 at 2^22 pairs, i.e. the platform
    primitive already runs AT the real device-sort rate (the network's
    per-stage cost is Mosaic data movement, see :func:`_stage_rows`), so
    it stays the production path.  ``prefer="bitonic"`` runs the kernel
    network (sizes within its envelope; exact same multiset contract) —
    kept as the measured-proof artifact and for schedules where the
    grid-parallel form composes better.
    """
    if prefer not in ("lax", "bitonic"):
        raise ValueError(f"prefer must be 'lax' or 'bitonic', got {prefer!r}")
    if hi.shape != lo.shape:
        raise TypeError(f"key shapes differ: {hi.shape} vs {lo.shape}")
    if hi.dtype != jnp.uint32 or lo.dtype != jnp.uint32:
        raise TypeError(f"expected u32 keys, got {hi.dtype}/{lo.dtype}")
    n0 = int(np.prod(hi.shape)) if hi.shape else 1
    n = 1 << max((n0 - 1).bit_length(), 1)
    if prefer == "lax" or n < 4 * BITONIC_COLS or n > BITONIC_MAX_N:
        return jax.lax.sort(
            (hi.reshape(-1), lo.reshape(-1)), num_keys=2
        )
    return _sort_pairs_bitonic(
        hi.reshape(-1), lo.reshape(-1), interpret=interpret
    )
