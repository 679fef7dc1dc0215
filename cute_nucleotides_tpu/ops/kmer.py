"""K-mer extraction and counting on the 2-bit packed domain.

The point of a 2-bit codec in production is what you can do *without
decoding*; k-mers are the canonical example.  A k-mer starting at nucleotide
``i`` is simply bits ``[2i, 2i + 2k)`` of the packed stream, so extraction is
a funnel shift over adjacent u32 words — no ASCII round-trip, ~1/4 the
memory traffic of a byte-domain k-mer scan.

Two tiers:

* **XLA gather tier** (:func:`kmer_codes`): position-ordered codes via two
  ``jnp.take`` gathers; simple, order-exact, slow (index materialization).
* **Pallas tier** (:func:`kmer_codes_planar`, used by
  :func:`kmer_histogram`): lane-local funnel shifts over (row, word-lane)
  panels producing PLANAR codes (shift-plane major — a permutation of the
  position order, which a histogram doesn't care about), plus an MXU
  histogram kernel: each code splits into hi/lo bytes, one-hot rows are
  built along the *sublane* axis (256 bins) and ``counts[hi, lo]`` is the
  int8 matmul ``A_r @ B_r^T`` contracting over lanes — the TPU-native
  replacement for a serial scatter-add (measured 138 ms for 16.7 M adds on
  a v5e; the matmul path is ~20x faster).

Supports k <= 15 for extraction (codes fit int32 with headroom); the MXU
histogram covers k <= 8 (65,536 bins = one (256, 256) accumulator tile),
larger k falls back to scatter-add.  Canonical form (the lexicographic
minimum of a k-mer and its reverse complement, the standard de-duplication
in assembly/counting pipelines) uses the same SWAR field-reversal tricks as
:mod:`.seqops`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import spec

__all__ = [
    "kmer_codes",
    "kmer_codes_planar",
    "revcomp_code",
    "canonical_codes",
    "kmer_histogram",
]


@functools.partial(jax.jit, static_argnames=("length", "k"))
def kmer_codes(words: jax.Array, length: int, k: int) -> jax.Array:
    """All k-mer codes of a packed u32[W] stream: -> i32[length - k + 1].

    Code layout matches the packing: the first nucleotide of the k-mer is the
    LEAST significant 2 bits (LSB-first, like the words themselves).
    """
    if not 1 <= k <= 15:
        raise ValueError("k must be in [1, 15]")
    if words.ndim != 1:
        raise TypeError("kmer_codes takes a flat u32 word stream")
    n = length - k + 1
    if n <= 0:
        raise ValueError(f"length {length} too short for k={k}")
    if length > words.shape[0] * spec.NT_PER_U32_2BIT:
        raise ValueError("length exceeds stream capacity")
    # funnel shift: position i needs word i//16 and its successor
    padded = jnp.concatenate([words, jnp.zeros(1, jnp.uint32)])
    i = jnp.arange(n)
    wl = jnp.take(padded, i // 16)
    wh = jnp.take(padded, i // 16 + 1)
    s = (2 * (i % 16)).astype(jnp.uint32)
    window = (wl >> s) | jnp.where(s == 0, jnp.uint32(0), wh << (32 - s))
    return (window & jnp.uint32((1 << (2 * k)) - 1)).astype(jnp.int32)


def revcomp_code(codes: jax.Array, k: int) -> jax.Array:
    """Reverse-complement of 2-bit k-mer codes (elementwise, SWAR)."""
    c = codes.astype(jnp.uint32) ^ jnp.uint32(0xAAAAAAAA >> (32 - 2 * k) if k < 16 else 0xAAAAAAAA)
    # reverse the sixteen 2-bit fields of the u32, then shift down to k fields
    c = ((c & jnp.uint32(0x33333333)) << 2) | ((c >> 2) & jnp.uint32(0x33333333))
    c = ((c & jnp.uint32(0x0F0F0F0F)) << 4) | ((c >> 4) & jnp.uint32(0x0F0F0F0F))
    c = ((c & jnp.uint32(0x00FF00FF)) << 8) | ((c >> 8) & jnp.uint32(0x00FF00FF))
    c = (c << 16) | (c >> 16)
    return (c >> (32 - 2 * k)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def canonical_codes(codes: jax.Array, k: int) -> jax.Array:
    """min(code, revcomp(code)) — the canonical k-mer form."""
    return jnp.minimum(codes, revcomp_code(codes, k))


# --- Pallas tier ------------------------------------------------------------

#: word lanes per panel row in the planar codes kernel
_PLANAR_W = 512
_HIST_ROWS = 8  # codes rows folded into the accumulator per grid step


def _codes_planar_kernel(k: int):
    def kernel(w_ref, n_ref, o_ref):
        mask = jnp.uint32((1 << (2 * k)) - 1)
        w = w_ref[:]
        nx = n_ref[:]
        W = w.shape[1]
        for s in range(spec.NT_PER_U32_2BIT):
            c = (w >> (2 * s)) if s else w
            if s:
                c = c | (nx << (32 - 2 * s))
            o_ref[:, W * s : W * (s + 1)] = (c & mask).astype(jnp.int32)

    return kernel


def kmer_codes_planar(
    words: jax.Array, nxt: jax.Array, k: int, *, interpret: bool = False
) -> jax.Array:
    """Funnel-shift k-mer extraction: u32[R, W] panels -> i32[R, 16 W].

    ``nxt`` is the successor stream (``nxt[r, w]`` = the word after
    ``words[r, w]`` in stream order; one cheap XLA shift on the packed
    side).  Output is PLANAR: the code starting at nucleotide ``16 w + s``
    of row ``r`` lands at column ``W s + w`` — a fixed permutation of
    position order (use :func:`kmer_codes` when order matters).
    """
    from . import pallas_kernels as pk

    if words.shape != nxt.shape or words.ndim != 2 or words.shape[1] % 128:
        raise TypeError(f"expected matching u32[R, 128m] panels, got {words.shape}")
    interpret = pk._auto_interpret(interpret)
    R, W = words.shape
    rb = min(64, max(8, -(-R // 8) * 8))
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _codes_planar_kernel(k),
        grid=(pk._cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec((rb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rb, 16 * W), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, 16 * W), jnp.int32),
        interpret=interpret,
    )(words, nxt)


def _hist_mxu_kernel(c_ref, o_ref):
    """codes i32[rt, C] -> accumulate counts into o_ref i32[256, 256].

    counts[j1, j2] += #\\{elements with hi byte j1 and lo byte j2\\}: per
    sublane row, hi/lo one-hots are laid along the SUBLANE axis (256 bins)
    and contracted over lanes with one int8 MXU dot per row.
    """
    from jax.experimental import pallas as pl

    c = c_ref[:]
    rt, C = c.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (256, C), 0)
    acc = jnp.zeros((256, 256), jnp.int32)
    for r in range(rt):
        c_r = jax.lax.slice(c, (r, 0), (r + 1, C))  # (1, C) sublane row
        a = (jnp.broadcast_to(c_r >> 8, (256, C)) == j).astype(jnp.int8)
        b = (jnp.broadcast_to(c_r & 255, (256, C)) == j).astype(jnp.int8)
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += acc


def _hist_mxu(codes: jax.Array, *, interpret: bool = False) -> jax.Array:
    """codes i32[R, C] (any order, values < 65536) -> counts i32[256, 256]."""
    from . import pallas_kernels as pk
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = pk._auto_interpret(interpret)
    R, C = codes.shape
    rt = min(_HIST_ROWS, R)
    if R % rt:
        # a ragged last block would add Pallas-padded garbage rows to the
        # histogram; callers must pad codes rows (code 0) and correct after,
        # as _kmer_histogram_pallas does
        raise ValueError(f"codes rows {R} not a multiple of the {rt}-row block")
    return pl.pallas_call(
        _hist_mxu_kernel,
        grid=(pk._cdiv(R, rt),),
        in_specs=[pl.BlockSpec((rt, C), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        interpret=interpret,
    )(codes)


@functools.partial(jax.jit, static_argnames=("length", "k", "canonical"))
def _kmer_histogram_pallas(
    words: jax.Array, length: int, k: int, *, canonical: bool = False
) -> jax.Array:
    if not 1 <= k <= 8:
        raise ValueError("MXU histogram covers k in [1, 8]")
    if length - k + 1 <= 0:
        raise ValueError(f"length {length} too short for k={k}")
    if length > words.size * spec.NT_PER_U32_2BIT:
        raise ValueError("length exceeds stream capacity")
    flat = words.reshape(-1)
    Wtot = flat.shape[0]
    rows = -(-Wtot // _PLANAR_W)
    pad = rows * _PLANAR_W - Wtot
    nxt = jnp.concatenate([flat[1:], jnp.zeros(1, jnp.uint32)])
    if pad:
        z = jnp.zeros(pad, jnp.uint32)
        flat = jnp.concatenate([flat, z])
        nxt = jnp.concatenate([nxt, z])
    codes = kmer_codes_planar(
        flat.reshape(rows, _PLANAR_W), nxt.reshape(rows, _PLANAR_W), k
    )
    if canonical:
        codes = canonical_codes(codes, k)
    # mask positions past the last full window to bin 0, subtract them after:
    # planar col W*s + w of row r holds the code at position 16*(r*W + w) + s
    W = _PLANAR_W
    col = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 0)
    pos = 16 * (row * W + col % W) + col // W
    n_valid = length - k + 1
    invalid = pos >= n_valid
    codes = jnp.where(invalid, 0, codes)
    counts2d = _hist_mxu(codes.reshape(-1, W))
    counts = counts2d.reshape(-1)[: 4**k]
    n_invalid = codes.size - n_valid
    return counts.at[0].add(-n_invalid)


@functools.partial(jax.jit, static_argnames=("length", "k", "canonical"))
def _kmer_histogram_scatter(
    words: jax.Array, length: int, k: int, *, canonical: bool = False
) -> jax.Array:
    codes = kmer_codes(words, length, k)
    if canonical:
        codes = canonical_codes(codes, k)
    return jnp.zeros(4**k, jnp.int32).at[codes].add(1)


def kmer_histogram(
    words: jax.Array, length: int, k: int, *, canonical: bool = False
) -> jax.Array:
    """Count every k-mer of a packed stream: -> i32[4**k].

    ``canonical=True`` folds each k-mer with its reverse complement first.
    For k <= 8 this runs the Pallas planar-extraction + MXU histogram
    pipeline (no scatter); larger k uses the XLA gather + scatter-add path
    (memory is 4 * 4**k bytes — k=12 is already 64 MiB, keep k modest).
    """
    if k <= 8:
        return _kmer_histogram_pallas(words, length, k, canonical=canonical)
    return _kmer_histogram_scatter(words, length, k, canonical=canonical)
