"""Pallas (Mosaic) kernel tier: hand-tiled TPU kernels for the hot codecs.

Design — the identity-lane formulation
--------------------------------------
The TPU VPU has no pext/pdep/movemask and no cheap arbitrary lane shuffle, so
instead of translating the reference's AVX2 byte-shuffles
(reference src/n_to_bits.rs:172-207 etc.) the kernels are built so that **no
cross-lane data movement happens at all**:

* The device-canonical form of a nucleotide byte stream is ``nt4``: a
  ``uint32`` array whose lane ``j`` holds ASCII bytes ``4j..4j+3``
  little-endian.  On the host this is a free ``ndarray.view`` of the byte
  stream; no device-side bitcast pass is ever needed.
* The packed form is the ``uint8`` stream of packed bytes (byte ``j`` holds
  nucleotides ``4j..4j+3``, 2 bits each, LSB-first).  Viewing that stream as
  little-endian u64 gives exactly the reference's ``Vec<u64>`` layout
  (reference src/n_to_bits.rs:38-43).

With those two forms, 2-bit **encode** is ``packed_u8[j] = pack4(nt4_u32[j])``
and **decode** is ``nt4_u32[j] = unpack4(packed_u8[j])`` — one output element
per input lane, pure elementwise VPU arithmetic at (8,128) register shape,
fully memory-bound.  ``pack4`` uses either the multiply-as-bit-shuffle
(one u32 multiply gathers all four 2-bit codes — the TPU port of the
reference's ``n_to_bits_mul`` magic, src/n_to_bits.rs:213-259) or a log-depth
shift-OR tree (the ``n_to_bits_shift`` analogue, src/n_to_bits.rs:121-166).

Tiling: inputs are processed as ``(rows, lanes)`` panels with a 1-D grid over
row blocks; lane width is kept large (>=512) so each VMEM tile streams
sequentially from HBM.  Row-block size adapts to a VMEM budget.

The base-5 codec's 27-nt/63-bit stride admits no identity lane map (27 input
bytes -> 8 output bytes); its Pallas path uses the MXU as the bit-scatter
engine (see ``_B5 kernels`` below): every 16-bit half of an output word is an
exact f32 linear combination of small lane-local "pieces" extracted from
triplet values, so one constant matmul performs the entire 7-bit packing that
pext does in the reference (src/n_to_bits2.rs:169-171).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import spec, xla

# ---------------------------------------------------------------------------
# Tiling policy
# ---------------------------------------------------------------------------

#: VMEM budget per buffered copy of (input tile + output tile); Mosaic
#: double-buffers both across grid steps, and the core has ~16 MiB of VMEM,
#: so keep one copy well under half of that.
VMEM_BUDGET = 3 * 1024 * 1024

#: the 2-bit encoder reads wide (4 B/lane) and writes narrow (1 B/lane), so
#: a larger block amortizes grid/DMA overhead without hitting the scoped
#: limit — measured +18% (531 -> 627 GiB/s at C=2048) at a 512-row block.
#: The write-heavy decoder stays at 256 rows: its 4 B/lane OUTPUT block
#: plus SWAR temporaries overflow the 16 MiB scoped VMEM at 512 rows
#: (hard compile OOM, 18 > 16 MiB — r05 ablation tools/tune_dec2_rows.py),
#: and the r05 STORE ablation shows nothing to gain anyway: a pure
#: 1B->4B widen-store kernel measures 478-482 GiB/s across every feasible
#: tiling, so the shipped decoder (478) already sits at the write-path
#: bound (see docs/DESIGN.md "decode_2bit is write-path-bound").
ENC_VMEM_BUDGET = 6 * 1024 * 1024


def _row_block(
    lanes: int, bytes_per_lane: int, rows: int, budget: int = VMEM_BUDGET
) -> int:
    """Pick a row-block size: multiple of 8, within VMEM budget.

    ``bytes_per_lane`` counts input + output bytes per lane-column.
    """
    max_rows = max(budget // max(lanes * bytes_per_lane, 1), 8)
    rb = 1 << (max_rows.bit_length() - 1)
    rb = min(rb, 1024)
    rb = max(rb, 8)
    rows8 = -(-rows // 8) * 8  # round up so small-R blocks stay 8-aligned
    return min(rb, max(8, rows8))


def _row_block8(rows: int, cap: int = 256) -> int:
    """Fixed-cap row block, rounded UP to the sublane multiple of 8 for
    small row counts (unaligned second-to-minor block sizes are a Mosaic
    lowering hazard; see docs/DESIGN.md and the _row_block policy)."""
    return min(cap, max(8, -(-rows // 8) * 8))


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _auto_interpret(interpret: bool) -> bool:
    """Pallas compiles only for TPU; fall back to interpret mode on CPU
    (keeps the 'pallas' tier usable everywhere, e.g. the CPU test mesh)."""
    if interpret:
        return True
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# 2-bit codec kernels (identity lane map)
# ---------------------------------------------------------------------------

def _pack4_mul(w: jax.Array) -> jax.Array:
    """u32 lane of 4 ASCII nt -> packed byte via multiply-as-bit-shuffle."""
    t = w & jnp.uint32(0x06060606)
    return (t * jnp.uint32(xla.MUL_MAGIC)) >> 24


def _pack4_shift(w: jax.Array) -> jax.Array:
    """u32 lane of 4 ASCII nt -> packed byte via log-depth shift-OR tree."""
    t = (w >> 1) & jnp.uint32(0x03030303)
    u = t | (t >> 6)
    return (u | (u >> 12)) & jnp.uint32(0xFF)


def _pack4_interleave(w: jax.Array) -> jax.Array:
    """u32 lane of 4 ASCII nt -> packed byte via even/odd code interleave.

    The TPU analogue of the reference's movemask encoder
    (reference src/n_to_bits.rs:172-207): where AVX2 separates even/odd
    bytes with ``unpacklo/hi_epi8`` and extracts one bit-plane per
    ``movemask``, here the even codes (nt 0, 2) and odd codes (nt 1, 3) are
    masked out of the lane as two sparse planes, the odd plane is slotted
    two bits up, and one fold merges the 16-bit halves — a genuinely
    different dataflow from the ``shift`` tree (which merges adjacent byte
    pairs first) and the ``mul`` shuffle (one multiply).
    """
    e = (w >> 1) & jnp.uint32(0x00030003)   # codes of nt 0 and 2
    o = (w >> 9) & jnp.uint32(0x00030003)   # codes of nt 1 and 3
    m = e | (o << 2)                        # c0@0 c1@2 | c2@16 c3@18
    return (m | (m >> 12)) & jnp.uint32(0xFF)


_PACK4 = {"mul": _pack4_mul, "shift": _pack4_shift, "interleave": _pack4_interleave}
ENCODE_2BIT_VARIANTS = ("mul", "shift", "interleave", "mxu")


def _unpack4_shuffle(b: jax.Array) -> jax.Array:
    """Packed byte (i32 lane) -> u32 of 4 ASCII chars via packed-LUT shifts.

    The 4-entry LUT lives in one u32 constant and is indexed with a variable
    per-lane shift — the VPU analogue of the reference's 16-byte
    ``shuffle_epi8`` LUT (reference src/n_to_bits.rs:287-299).
    """
    lut = jnp.uint32(spec.BITS_TO_CHAR_2BIT_U32)
    ch0 = (lut >> ((b & 3) << 3)) & jnp.uint32(0xFF)
    ch1 = (lut >> (((b >> 2) & 3) << 3)) & jnp.uint32(0xFF)
    ch2 = (lut >> (((b >> 4) & 3) << 3)) & jnp.uint32(0xFF)
    ch3 = (lut >> (((b >> 6) & 3) << 3)) & jnp.uint32(0xFF)
    return ch0 | (ch1 << 8) | (ch2 << 16) | (ch3 << 24)


def _unpack4_select(b: jax.Array) -> jax.Array:
    """Packed byte -> 4 ASCII chars via an arithmetic select tree (no shifts)."""

    def to_char(c):
        ch = jnp.uint32(ord("A"))
        ch = ch + jnp.where(c == 1, jnp.uint32(2), jnp.uint32(0))
        ch = ch + jnp.where(c == 2, jnp.uint32(19), jnp.uint32(0))
        ch = ch + jnp.where(c == 3, jnp.uint32(6), jnp.uint32(0))
        return ch

    return (
        to_char(b & 3)
        | (to_char((b >> 2) & 3) << 8)
        | (to_char((b >> 4) & 3) << 16)
        | (to_char((b >> 6) & 3) << 24)
    )


_UNPACK4 = {"shuffle": _unpack4_shuffle, "select": _unpack4_select}


def _encode_2bit_kernel(variant: str):
    pack4 = _PACK4[variant]

    def kernel(x_ref, o_ref):
        o_ref[:] = pack4(x_ref[:]).astype(jnp.uint8)

    return kernel


def _decode_2bit_kernel(variant: str):
    unpack4 = _UNPACK4[variant]

    def kernel(x_ref, o_ref):
        b = x_ref[:].astype(jnp.int32).astype(jnp.uint32)
        o_ref[:] = unpack4(b)

    return kernel


def encode_2bit_nt4(x: jax.Array, variant: str = "mul", *, interpret: bool = False) -> jax.Array:
    """Encode nt4 u32[R, C] -> packed u8[R, C] (identity lane map).

    Lane ``(r, j)`` of the output holds the packed byte for nucleotides
    ``4*(r*C + j) .. +4`` of the stream.  Bit-exact to the reference's
    encoders on every byte (layout contract src/n_to_bits.rs:38-43).
    """
    if x.dtype != jnp.uint32 or x.ndim != 2:
        raise TypeError(f"expected u32[R, C] nt4 input, got {x.dtype}{x.shape}")
    interpret = _auto_interpret(interpret)
    R, C = x.shape
    rb = _row_block(C, 4 + 1, R, ENC_VMEM_BUDGET)
    return pl.pallas_call(
        _encode_2bit_kernel(variant),
        grid=(_cdiv(R, rb),),
        in_specs=[pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint8),
        interpret=interpret,
    )(x)


def decode_2bit_nt4(p: jax.Array, variant: str = "swar", *, interpret: bool = False) -> jax.Array:
    """Decode packed u8[R, C] -> nt4 u32[R, C] (identity lane map)."""
    if p.dtype != jnp.uint8 or p.ndim != 2:
        raise TypeError(f"expected u8[R, C] packed input, got {p.dtype}{p.shape}")
    interpret = _auto_interpret(interpret)
    R, C = p.shape
    rb = _row_block(C, 4 + 1, R)
    return pl.pallas_call(
        _decode_2bit_kernel(variant),
        grid=(_cdiv(R, rb),),
        in_specs=[pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
        interpret=interpret,
    )(p)


# ---------------------------------------------------------------------------
# Fused encode + validation (SURVEY §5: validation as an optional KERNEL pass)
# ---------------------------------------------------------------------------
# The standalone ``ops.validate`` pass re-reads the whole input from HBM; for
# memory-bound encodes that doubles the traffic.  These variants compute a
# per-row invalidity flag inside the encode kernel for ~12 extra VPU ops per
# lane: reconstruct the ASCII char the 2-bit code would DECODE to (the SWAR
# decode trick) and XOR against the case-folded input — a byte is valid iff
# it round-trips, except 'U' (0x55) whose single low-bit difference from 'T'
# (0x54) is forgiven by masking bit 0 on code==2 bytes.  Exact for all 256
# byte values.  Diagnosis (count / first position) stays in
# :mod:`..ops.validate` and only runs on flagged rows.

def _invalid_bits_nt4(w: jax.Array) -> jax.Array:
    """u32 nt4 lane -> u32 with nonzero bits exactly at bytes not in
    {A,C,G,T,U} (either case)."""
    v = w & jnp.uint32(0xDFDFDFDF)                 # fold case
    s = (w >> 1) & jnp.uint32(0x03030303)          # 2-bit codes per byte
    e = (s >> 1) & (~s) & jnp.uint32(0x01010101)   # [code == 2] per byte
    exp = jnp.uint32(0x41414141) + (s << 1) + e * jnp.uint32(15)
    return (v ^ exp) & ~e


def _encode_2bit_checked_kernel(variant: str):
    pack4 = _PACK4[variant]

    def kernel(x_ref, o_ref, b_ref):
        w = x_ref[:]
        o_ref[:] = pack4(w).astype(jnp.uint8)
        bad = _invalid_bits_nt4(w)
        rb, C = w.shape
        acc = jax.lax.slice(bad, (0, 0), (rb, 128))
        for g in range(1, C // 128):
            acc = acc | jax.lax.slice(bad, (0, 128 * g), (rb, 128 * (g + 1)))
        b_ref[:] = acc

    return kernel


def encode_2bit_nt4_checked(
    x: jax.Array, variant: str = "mul", *, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Fused encode + validity: nt4 u32[R, C] -> (packed u8[R, C],
    badplane u32[R, 128]); C % 128 == 0.

    Any nonzero bit in ``badplane[r]`` means row ``r`` contains a byte
    outside {A,C,G,T,U} (either case); ``jnp.any(badplane != 0, axis=-1)``
    is the per-row flag.  Single HBM read — the separate
    :func:`..ops.validate.count_invalid` pass costs a second one.
    """
    if x.dtype != jnp.uint32 or x.ndim != 2 or x.shape[1] % 128:
        raise TypeError(f"expected u32[R, 128k] nt4 input, got {x.dtype}{x.shape}")
    interpret = _auto_interpret(interpret)
    R, C = x.shape
    # the validity temporaries (~2 extra u32 planes) push the 512-row block
    # of ENC_VMEM_BUDGET past the 16 MiB scoped-VMEM limit; stay at the
    # standard budget (256-row blocks at C=2048)
    rb = _row_block(C, 4 + 1, R)
    return pl.pallas_call(
        _encode_2bit_checked_kernel(variant),
        grid=(_cdiv(R, rb),),
        in_specs=[pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), jnp.uint8),
            jax.ShapeDtypeStruct((R, 128), jnp.uint32),
        ],
        interpret=interpret,
    )(x)


def encode_2bit_words_checked(
    x: jax.Array, variant: str = "mul", *, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Fused words-API encode + per-row validity flag:
    u8[..., L] -> (u32[..., L // 16], bool[...]).

    Lanes are padded to the 128-lane check granularity with ``'A'`` (valid,
    packs to zero) and pad words sliced off, as the mxu encoder does.
    """
    w, lead = _as_panels_u32(x)
    R, C = w.shape
    pad = (-C) % 128
    if pad:
        w = jnp.concatenate(
            [w, jnp.full((R, pad), 0x41414141, jnp.uint32)], axis=1
        )
    packed, badplane = encode_2bit_nt4_checked(w, variant, interpret=interpret)
    if pad:
        packed = packed[:, :C]
    words = jax.lax.bitcast_convert_type(
        packed.reshape(R, C // 4, 4), jnp.uint32
    )
    bad = jnp.any(badplane != 0, axis=-1)
    return words.reshape(*lead, x.shape[-1] // 16), bad.reshape(lead)


# ---------------------------------------------------------------------------
# Shape adapters: (..., L) byte-stream API  <->  nt4 panels
# ---------------------------------------------------------------------------

def _as_panels_u32(x: jax.Array) -> tuple[jax.Array, tuple]:
    """u8[..., L] -> nt4 u32[R, C] panels (device bitcast; prefer feeding
    nt4 directly via the host view to skip this)."""
    L = x.shape[-1]
    if L % spec.NT_PER_U32_2BIT:
        raise ValueError(f"last dim {L} not a multiple of 16")
    lead = x.shape[:-1]
    w = jax.lax.bitcast_convert_type(
        x.reshape(*lead, L // 4, 4), jnp.uint32
    ).reshape(-1, L // 4)
    return w, lead


def encode_2bit_words(x: jax.Array, variant: str = "mul", *, interpret: bool = False) -> jax.Array:
    """Drop-in Pallas analogue of :func:`..ops.xla.encode_2bit_words`:
    u8[..., L] -> u32[..., L // 16]."""
    w, lead = _as_panels_u32(x)
    packed = encode_2bit_nt4(w, variant, interpret=interpret)  # u8[R, L//4]
    out = jax.lax.bitcast_convert_type(
        packed.reshape(*lead, x.shape[-1] // 16, 4), jnp.uint32
    )
    return out


def decode_2bit_bytes(words: jax.Array, variant: str = "swar", *, interpret: bool = False) -> jax.Array:
    """Drop-in Pallas analogue of :func:`..ops.xla.decode_2bit_bytes`:
    u32[..., W] -> u8[..., 16*W]."""
    W = words.shape[-1]
    lead = words.shape[:-1]
    p = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1, W * 4)
    nt4 = decode_2bit_nt4(p, variant, interpret=interpret)  # u32[R, 4W]
    return jax.lax.bitcast_convert_type(nt4, jnp.uint8).reshape(*lead, 16 * W)


@functools.lru_cache(maxsize=None)
def jit_encode_2bit_nt4(variant: str = "mul"):
    return jax.jit(functools.partial(encode_2bit_nt4, variant=variant))


@functools.lru_cache(maxsize=None)
def jit_decode_2bit_nt4(variant: str = "swar"):
    return jax.jit(functools.partial(decode_2bit_nt4, variant=variant))


@functools.lru_cache(maxsize=None)
def jit_encode_2bit_nt4_mxu():
    return jax.jit(encode_2bit_nt4_mxu)


@functools.lru_cache(maxsize=None)
def jit_encode_2bit(variant: str = "mul"):
    if variant == "mxu":
        return jax.jit(encode_2bit_words_mxu)
    return jax.jit(functools.partial(encode_2bit_words, variant=variant))


@functools.lru_cache(maxsize=None)
def jit_decode_2bit(variant: str = "swar"):
    return jax.jit(functools.partial(decode_2bit_bytes, variant=variant))


@functools.lru_cache(maxsize=None)
def jit_encode_2bit_checked(variant: str = "mul"):
    return jax.jit(functools.partial(encode_2bit_words_checked, variant=variant))


@functools.lru_cache(maxsize=None)
def jit_encode_b5_checked():
    return jax.jit(encode_b5_words_checked)


def encode_2bit(variant: str = "mul"):
    """Traceable encode fn (for shard_map composition)."""
    if variant == "mxu":
        # same routing as jit_encode_2bit: 'mxu' is a whole-word MXU
        # pack, not a _PACK4 lane kernel (r05 review: the data-parallel
        # paths crashed with KeyError on this documented variant)
        return encode_2bit_words_mxu
    return functools.partial(encode_2bit_words, variant=variant)


def decode_2bit(variant: str = "swar"):
    return functools.partial(decode_2bit_bytes, variant=variant)




# ---------------------------------------------------------------------------
# Base-5 Pallas kernels: MXU as the bit-scatter engine
# ---------------------------------------------------------------------------
# No identity lane map exists for the 27-nt/63-bit stride (27 input bytes ->
# 8 output bytes); the MXU is the bit mover.  A 63-bit word splits at triplet
# boundaries into three 21-bit chunks
#
#   word bits: t0@0 t1@7 t2@14 | t3@21 t4@28 t5@35 | t6@42 t7@49 t8@56
#   g_c = t_{3c} + t_{3c+1}*2^7 + t_{3c+2}*2^14          (c = 0, 1, 2)
#
# which are *linear in the base-5 digits* (coefficient 5^k * 2^(7(j-3c)),
# <= 25*2^14, exact in bf16; products < 2^21 accumulate exactly in f32) —
# so ONE constant matmul performs the entire 7-bit packing that pext does in
# the reference (src/n_to_bits2.rs:169-171), folding in the triplet mul-adds
# (the maddubs analogue, src/n_to_bits2.rs:160-165).  Recombination is
# lane-local per word: lo = g0 | (g1 & 0x7FF) << 21; hi = (g1>>11)|(g2<<10).
#
# Layout: one kernel row covers 3456 nt = 128 words (lcm(27,128)); the
# matmul's column blocks [g0 | g1 | g2] are 128-lane aligned, so the kernel
# needs NO sub-register lane slicing (an earlier per-slice formulation was
# miscompiled by Mosaic for rare inputs — see _b5_enc_mat_v2).  The decoder
# uses a padded "16 t-lanes per word" layout (B5_TPAD) for the same
# alignment reason.

B5_ROW_NT = 3456          # nt per kernel row = 128 words
B5_ROW_WORDS = 128
B5_ROW_U32 = 256          # output u32 lanes per row
B5_SLICES = 8             # decoder: 432-nt slices per row
B5_SLICE_NT = 432         # 16 words
B5_SLICE_WORDS = 16
B5_TPAD = 16              # t-lanes per word (9 used, padded to 16)


def _encode_b5_words_impl(x: jax.Array, checked: bool, interpret: bool):
    """Shared words-API scaffolding: flatten to padded panels, encode,
    re-split.  Panel padding is ``'A'`` (digit 0 — the reference's tail
    semantics, and valid for the checked variant's flag)."""
    L = x.shape[-1]
    if L % spec.NT_PER_WORD_B5:
        raise ValueError(f"last dim {L} not a multiple of 27")
    lead = x.shape[:-1]
    n = int(np.prod(lead, dtype=np.int64)) if lead else 1
    total = n * L
    rows = _cdiv(max(total, 1), B5_ROW_NT)
    flat = x.reshape(-1)
    pad = rows * B5_ROW_NT - total
    if pad:
        flat = jnp.concatenate([flat, jnp.full(pad, ord("A"), jnp.uint8)])
    panels = flat.reshape(rows, B5_ROW_NT)
    if checked:
        out, badplane = encode_b5_panels_checked(panels, interpret=interpret)
    else:
        out = encode_b5_panels_v2(panels, interpret=interpret)
    words = out.reshape(-1)[: n * (2 * (L // 27))].reshape(*lead, 2 * (L // 27))
    if checked:
        return words, jnp.any(badplane != 0)
    return words


def encode_b5_words_pallas(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Drop-in Pallas analogue of :func:`..ops.xla.encode_b5_words`:
    u8[..., L] -> u32[..., 2*(L//27)], L % 27 == 0.

    Rows are independent streams, but because L % 27 == 0 their word
    boundaries survive flattening, so the whole batch is encoded as one
    padded panel stream and re-split.
    """
    return _encode_b5_words_impl(x, checked=False, interpret=interpret)


# --- base-5 decode -----------------------------------------------------------
# Inverse pipeline: planar (lo, hi) u32 word-half planes -> 16-bit halves ->
# MXU expansion to the padded t16 layout -> per-lane bit splicing + Lemire
# multiply-shift div/mod (reference src/n_to_bits2.rs:241-247) -> three char
# planes -> one 0/1 matmul scatters chars to their 27-per-word positions
# (the inverse of the encode's bit-scatter matmul).

#: bit offset of triplet j inside its 16-bit half: 7j - 16*a(j)
_B5_TRIP_SHIFT = {j: 7 * j - 16 * ((7 * j) // 16) for j in range(9)}
_B5_TRIP_HALF = {j: (7 * j) // 16 for j in range(9)}  # a(j)


@functools.lru_cache(maxsize=None)
def _b5_dec_mats():
    """Constant matrices for the base-5 decode kernel."""
    # PA/PB: byte-split halves (128,) -> t16 lanes (256,).  Matmul inputs are
    # rounded to bf16 by the MXU, so 16-bit half values are fed as exact
    # low/high bytes (lanes [0,64) = h_a & 0xFF at 16a + w; lanes [64,128) =
    # h_a >> 8) with the 256x weight folded into the matrix.
    pa = np.zeros((128, B5_SLICE_WORDS * B5_TPAD), np.float32)
    pb = np.zeros((128, B5_SLICE_WORDS * B5_TPAD), np.float32)
    for w in range(B5_SLICE_WORDS):
        for j in range(9):
            a = _B5_TRIP_HALF[j]
            pa[16 * a + w, B5_TPAD * w + j] = 1.0
            pa[64 + 16 * a + w, B5_TPAD * w + j] = 256.0
            if _B5_TRIP_SHIFT[j] > 9:  # spills into the next half
                pb[16 * (a + 1) + w, B5_TPAD * w + j] = 1.0
                pb[64 + 16 * (a + 1) + w, B5_TPAD * w + j] = 256.0
    # G_k: chars (256,) at t16 lanes -> nt (432,): G_k[16w+j, 27w+3j+k] = 1
    gs = np.zeros((3, B5_SLICE_WORDS * B5_TPAD, B5_SLICE_NT), np.float32)
    for w in range(B5_SLICE_WORDS):
        for j in range(9):
            for k in range(3):
                gs[k, B5_TPAD * w + j, 27 * w + 3 * j + k] = 1.0
    return tuple(
        np.asarray(m, dtype=jnp.bfloat16) for m in (pa, pb, gs[0], gs[1], gs[2])
    )


def _b5_trip_shift_vec(shape):
    """Per-lane (period-16) triplet bit-offset vector s_j."""
    j16 = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1) & 15
    s = jnp.zeros(shape, jnp.int32)
    for j, sj in _B5_TRIP_SHIFT.items():
        s = jnp.where(j16 == j, sj, s)
    return s


def _digits_to_chars(d: jax.Array) -> jax.Array:
    """Digit 0..4 (i32) -> ASCII char, matching reference src/n_to_bits2.rs:25-33."""
    lut = jnp.int32(spec.BITS_TO_CHAR_2BIT_U32)
    return jnp.where(
        d == 4, jnp.int32(ord("N")), (lut >> (jnp.minimum(d, 3) << 3)) & 0xFF
    )


def _decode_b5_kernel(lo_ref, hi_ref, pa_ref, pb_ref, g0_ref, g1_ref, g2_ref, o_ref):
    lo = lo_ref[:]
    hi = hi_ref[:]
    rb = lo.shape[0]
    tshape = (rb, B5_SLICE_WORDS * B5_TPAD)
    svec = _b5_trip_shift_vec(tshape)
    m16 = jnp.uint32(0xFFFF)
    for g in range(B5_SLICES):
        lo_g = jax.lax.slice(lo, (0, 16 * g), (rb, 16 * (g + 1)))
        hi_g = jax.lax.slice(hi, (0, 16 * g), (rb, 16 * (g + 1)))
        h = [lo_g & m16, lo_g >> 16, hi_g & m16, hi_g >> 16]
        m8 = jnp.uint32(0xFF)
        halves = jnp.concatenate(
            [x & m8 for x in h] + [x >> 8 for x in h], axis=1
        ).astype(jnp.int32).astype(jnp.bfloat16)  # (rb, 128) exact bytes
        a = jnp.dot(halves, pa_ref[:], preferred_element_type=jnp.float32)
        b = jnp.dot(halves, pb_ref[:], preferred_element_type=jnp.float32)
        ai = a.astype(jnp.int32)
        bi = b.astype(jnp.int32)
        t = ((ai >> svec) | (bi << (16 - svec))) & 0x7F
        # exact multiply-shift division on the 7-bit domain
        q5 = (t * 205) >> 10
        q25 = (t * 41) >> 10
        ch0 = _digits_to_chars(t - 5 * q5).astype(jnp.bfloat16)
        ch1 = _digits_to_chars(q5 - 5 * q25).astype(jnp.bfloat16)
        ch2 = _digits_to_chars(q25).astype(jnp.bfloat16)
        out_g = (
            jnp.dot(ch0, g0_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(ch1, g1_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(ch2, g2_ref[:], preferred_element_type=jnp.float32)
        )
        o_ref[:, B5_SLICE_NT * g : B5_SLICE_NT * (g + 1)] = out_g.astype(jnp.int32).astype(jnp.uint8)


def decode_b5_panels(lo: jax.Array, hi: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Decode planar u32[R, 128] word-half planes -> u8[R, 3456] nt panels."""
    if lo.shape != hi.shape or lo.ndim != 2 or lo.shape[1] != B5_ROW_WORDS:
        raise TypeError(f"expected u32[R, {B5_ROW_WORDS}] planes, got {lo.shape}/{hi.shape}")
    interpret = _auto_interpret(interpret)
    R = lo.shape[0]
    rb = _row_block8(R)
    mats = _b5_dec_mats()
    mat_specs = [
        pl.BlockSpec(m.shape, lambda i, nd=m.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for m in mats
    ]
    return pl.pallas_call(
        _decode_b5_kernel,
        grid=(_cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec((rb, B5_ROW_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, B5_ROW_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *mat_specs,
        ],
        out_specs=pl.BlockSpec((rb, B5_ROW_NT), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, B5_ROW_NT), jnp.uint8),
        interpret=interpret,
    )(lo, hi, *mats)


def depad_nt4_host(panels: np.ndarray) -> np.ndarray:
    """Host-side de-pad: (R, 896) u32 padded nt4 panels -> flat u8 stream.

    Each 112-u32 slice contributes its first 432 bytes; the host does in
    one memcpy-speed pass what would cost the device an extra HBM
    round-trip.  Uses the native C++ helper when available (one memcpy per
    432-byte run), else a u32-granular NumPy strided copy.
    """
    panels = np.ascontiguousarray(panels)
    if panels.ndim != 2 or panels.shape[1] != B5_NT4_PAD_LANES:
        # guard BEFORE the native call: a wrong-width array (e.g. the
        # unpadded 864-lane decoder output) would otherwise be read out of
        # bounds by the C helper, while the NumPy fallback merely raises
        raise TypeError(
            f"expected padded nt4 panels (R, {B5_NT4_PAD_LANES}), "
            f"got {panels.shape}"
        )
    R = panels.shape[0]
    from . import native as native_ops

    if native_ops.available():
        import ctypes

        lib = native_ops._lib()
        out = np.empty(R * B5_SLICES * 432, np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.cutenuc_depad_nt4(
            panels.view(np.uint8).ctypes.data_as(u8p),
            R,
            out.ctypes.data_as(u8p),
        )
        return out
    v = panels.reshape(R, B5_SLICES, 112)
    out32 = np.empty((R, B5_SLICES, 108), np.uint32)
    np.copyto(out32, v[:, :, :108])
    return out32.view(np.uint8).reshape(-1)


@functools.lru_cache(maxsize=None)
def jit_decode_b5_interleaved():
    return jax.jit(decode_b5_interleaved_panels)


@functools.lru_cache(maxsize=None)
def jit_encode_b5_panels():
    return jax.jit(encode_b5_panels_v2)


def _decode_b5_bytes_impl(words: jax.Array, checked: bool, interpret: bool):
    """Shared bytes-API scaffolding: flatten to padded panel rows, decode
    through the interleaved kernel (checked or not), strip the tile pad,
    re-split.  Returns ``(bytes, badplane | None)``."""
    if words.shape[-1] % 2:
        raise ValueError("base-5 packed stream must have even u32 count")
    lead = words.shape[:-1]
    W = words.shape[-1] // 2
    n = int(np.prod(lead, dtype=np.int64)) if lead else 1
    flat = words.reshape(-1)
    rows = _cdiv(max(n * W, 1), B5_ROW_WORDS)
    pad = 2 * rows * B5_ROW_WORDS - flat.shape[0]
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.uint32)])
    panel_rows = flat.reshape(rows, 2 * B5_ROW_WORDS)
    if checked:
        panels, badplane = decode_b5_interleaved_panels_checked(
            panel_rows, interpret=interpret
        )
    else:
        panels, badplane = (
            decode_b5_interleaved_panels(panel_rows, interpret=interpret),
            None,
        )
    data = panels.reshape(rows, B5_SLICES, 112)[:, :, :108]
    out = jax.lax.bitcast_convert_type(data, jnp.uint8)
    return out.reshape(-1)[: n * 27 * W].reshape(*lead, 27 * W), badplane


def decode_b5_bytes_pallas(words: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Drop-in Pallas analogue of :func:`..ops.xla.decode_b5_bytes`:
    u32[..., 2*W] -> u8[..., 27*W].

    Routed through the interleaved-input kernel (the u32 pair stream feeds
    it as-is, no planarize pass); the tile-pad is stripped with one XLA
    slice+reshape over the output.  Device consumers that can tolerate the
    padded layout should call :func:`decode_b5_interleaved_panels` directly
    and skip that pass (host consumers get it free via
    :func:`depad_nt4_host` — see api.bits_to_n2).
    """
    return _decode_b5_bytes_impl(words, checked=False, interpret=interpret)[0]


def decode_b5_bytes_checked(
    words: jax.Array, *, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Fused words-API base-5 decode + integrity flag:
    u32[..., 2W] -> (u8[..., 27W], bool scalar).

    The flag is True iff ANY u64 word of the stream is corrupt (a triplet
    value >= 125 or pad bit 63 set); the zero words padding the last panel
    row are valid, so they cannot false-positive.  On a flagged batch,
    diagnose with :func:`..ops.seqops.first_invalid_word_b5` (the rare
    path).  Mirrors :func:`..ops.pallas_kernels.encode_b5_words_checked`.
    """
    out, badplane = _decode_b5_bytes_impl(words, checked=True, interpret=interpret)
    return out, jnp.any(badplane != 0)


# ---------------------------------------------------------------------------
# Base-5 codec (Pallas tier) — registry hooks
# ---------------------------------------------------------------------------

def encode_b5():
    """Traceable base-5 encode fn (for shard_map composition)."""
    return encode_b5_words_pallas


def decode_b5():
    return decode_b5_bytes_pallas


@functools.lru_cache(maxsize=None)
def jit_encode_b5():
    return jax.jit(encode_b5_words_pallas)


@functools.lru_cache(maxsize=None)
def jit_decode_b5():
    return jax.jit(decode_b5_bytes_pallas)


@functools.lru_cache(maxsize=None)
def jit_decode_b5_checked():
    return jax.jit(decode_b5_bytes_checked)


# ---------------------------------------------------------------------------
# 2-bit encode, MXU variant
# ---------------------------------------------------------------------------
# A third packing strategy completing the variant menu (the reference has
# five encoders, src/n_to_bits.rs): instead of the identity-lane u8 output,
# pack four adjacent lanes' bytes into one u32 word with a constant matmul —
# the same "matrix as byte-gatherer" idea the base-5 kernels use.  Columns
# [0,128) collect the low 16 bits of each word (bytes 4j, 4j+1 weighted 1 and
# 256), columns [128,256) the high 16 bits.  Useful as the building block for
# fused consumers that want u32 words directly in VMEM.

@functools.lru_cache(maxsize=None)
def _mxu_pack_mat():
    m = np.zeros((512, 256), np.float32)
    for j in range(128):
        m[4 * j, j] = 1.0
        m[4 * j + 1, j] = 256.0
        m[4 * j + 2, 128 + j] = 1.0
        m[4 * j + 3, 128 + j] = 256.0
    return np.asarray(m, dtype=jnp.bfloat16)


def _encode_2bit_mxu_kernel(x_ref, m_ref, o_ref):
    p = _pack4_mul(x_ref[:]).astype(jnp.int32).astype(jnp.bfloat16)
    C = p.shape[1]
    for g in range(C // 512):
        z = jnp.dot(
            p[:, 512 * g : 512 * (g + 1)],
            m_ref[:],
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32).astype(jnp.uint32)
        o_ref[:, 128 * g : 128 * (g + 1)] = z[:, :128] | (z[:, 128:] << 16)


def encode_2bit_words_mxu(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Drop-in words-API form of the MXU pack (variant ``"mxu"``):
    u8[..., L] -> u32[..., L // 16].

    Columns are padded to the kernel's 512-lane granularity with ``'A'``
    lanes (0x41414141 -> packed 0, matching the reference's zero tail bits,
    src/n_to_bits.rs:38-43) and the pad words sliced off after.
    """
    w, lead = _as_panels_u32(x)  # u32[R, L // 4]
    R, C = w.shape
    pad = (-C) % 512
    if pad:
        w = jnp.concatenate(
            [w, jnp.full((R, pad), 0x41414141, jnp.uint32)], axis=1
        )
    words = encode_2bit_nt4_mxu(w, interpret=interpret)
    if pad:
        words = words[:, : C // 4]
    return words.reshape(*lead, x.shape[-1] // 16)


def encode_2bit_nt4_mxu(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Encode nt4 u32[R, C] -> packed u32 words [R, C // 4]; C % 512 == 0."""
    if x.dtype != jnp.uint32 or x.ndim != 2 or x.shape[1] % 512:
        raise TypeError(f"expected u32[R, 512k] nt4 input, got {x.dtype}{x.shape}")
    interpret = _auto_interpret(interpret)
    R, C = x.shape
    rb = _row_block(C, 4 + 1, R)
    m = _mxu_pack_mat()
    return pl.pallas_call(
        _encode_2bit_mxu_kernel,
        grid=(_cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, C // 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C // 4), jnp.uint32),
        interpret=interpret,
    )(x, m)


# ---------------------------------------------------------------------------
# Base-5 encode v2: g-chunk matmul + planar output
# ---------------------------------------------------------------------------
# A 63-bit word splits at triplet boundaries into three 21-bit chunks
#   g_c = t_{3c} + t_{3c+1}*2^7 + t_{3c+2}*2^14   (c = 0,1,2)
# which are *linear in the digits* (coef 5^k * 2^(7(j-3c)) <= 25*2^14, exact
# in bf16), so a single constant matmul maps digits -> chunks, eliminating
# the v1 pipeline's piece-extraction VPU stage and its second matmul pair.
# The chunk recombination is lane-local integer math per word:
#   lo = g0 | (g1 & 0x7FF) << 21        hi = (g1 >> 11) | (g2 << 10)
# and the kernel emits PLANAR (lo, hi) u32 planes — the exact input format of
# the Pallas base-5 decoder, so device-resident roundtrips never interleave;
# the reference's interleaved u64 stream is recovered by one cheap XLA pass
# over the packed (0.3x) side at export.

@functools.lru_cache(maxsize=None)
def _b5_enc_mat_v2():
    """digits (3456,) -> chunks (384,): register-aligned column blocks
    [g0 (128) | g1 (128) | g2 (128)], one column per word of the row.

    One full-row matmul so the kernel needs NO sub-register lane slices or
    16-lane stores: an earlier per-slice version extracted g-chunks at
    16-lane offsets and Mosaic miscompiled the slice+shift+or+narrow-store
    sequence for rare inputs (dropped low bits of g1 on specific lanes).
    The matrix is block-diagonal (dense cost ~2.7x the minimal matmul) but
    the kernel stays VPU-bound, so this is free in practice.
    """
    m = np.zeros((B5_ROW_NT, 3 * B5_ROW_WORDS), np.float32)
    for w in range(B5_ROW_WORDS):
        for j in range(9):
            c = j // 3
            for k in range(3):
                m[27 * w + 3 * j + k, 128 * c + w] = (1, 5, 25)[k] * (
                    1 << (7 * (j - 3 * c))
                )
    return np.asarray(m, dtype=jnp.bfloat16)


def _encode_b5_v2_kernel(x_ref, m_ref, lo_ref, hi_ref):
    x = x_ref[:].astype(jnp.int32)
    idx = x & 7
    digits = (jnp.int32(spec.DIGIT_LUT8_U32) >> (idx << 2)) & 0xF
    d = digits.astype(jnp.bfloat16)
    gc = jnp.dot(
        d, m_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32).astype(jnp.uint32)
    g0 = gc[:, :128]
    g1 = gc[:, 128:256]
    g2 = gc[:, 256:384]
    lo_ref[:] = g0 | ((g1 & jnp.uint32(0x7FF)) << 21)
    hi_ref[:] = (g1 >> 11) | (g2 << 10)


def encode_b5_planar(x: jax.Array, *, interpret: bool = False):
    """Encode u8[R, 3456] nt panels -> planar (lo, hi) u32[R, 128] planes.

    ``lo[r, w] | hi[r, w] << 32`` is word ``128 r + w`` of the reference's
    base-5 stream (src/n_to_bits2.rs:44-53); this planar form feeds
    :func:`decode_b5_panels` directly.
    """
    if x.dtype != jnp.uint8 or x.ndim != 2 or x.shape[1] != B5_ROW_NT:
        raise TypeError(f"expected u8[R, {B5_ROW_NT}], got {x.dtype}{x.shape}")
    interpret = _auto_interpret(interpret)
    R = x.shape[0]
    rb = _row_block8(R)
    m = _b5_enc_mat_v2()
    return pl.pallas_call(
        _encode_b5_v2_kernel,
        grid=(_cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec((rb, B5_ROW_NT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, B5_ROW_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, B5_ROW_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, B5_ROW_WORDS), jnp.uint32),
            jax.ShapeDtypeStruct((R, B5_ROW_WORDS), jnp.uint32),
        ],
        interpret=interpret,
    )(x, m)


#: encode group: 4 slices = 64 words = half a kernel row per matmul, the
#: smallest grouping whose P/Q column blocks are exactly 128-lane aligned
#: (words x 2 interleaved chunk lanes = 128)
B5_ENC_GRP_NT = 1728
B5_ENC_GRP_U32 = 128


@functools.lru_cache(maxsize=None)
def _b5_enc_mat_inter():
    """digits (1728,) -> duplicated g-chunks (256,) for one encode GROUP.

    Column blocks P = [0, 128) and Q = [128, 256): ``P[2w] = g0(w),
    P[2w+1] = g1(w), Q[2w] = g1(w), Q[2w+1] = g2(w)`` — each g-chunk is
    emitted twice (constants are free) so the lane-local splice
    ``even: P | (Q & 0x7FF) << 21;  odd: (P >> 11) | (Q << 10)`` produces
    the (lo, hi) u32 pair of word ``w`` at lanes ``2w, 2w+1`` — the
    reference's interleaved u64 stream directly, with no XLA re-interleave
    pass (which cost ~22% of the interleaved encode path).

    Grouping at 64 words (K = 1728, the smallest with 128-aligned P/Q
    blocks) instead of one whole-row matmul (K = 3456, 512 cols) halves
    the dense MXU work of the block-diagonal matrix, and the 2-group loop
    pipelines MXU against the splice: 156 -> 285 GiB/s measured.
    """
    m = np.zeros((B5_ENC_GRP_NT, 2 * B5_ENC_GRP_U32), np.float32)
    for w in range(B5_ENC_GRP_NT // 27):
        for j in range(9):
            c = j // 3
            for k in range(3):
                coef = (1, 5, 25)[k] * (1 << (7 * (j - 3 * c)))
                row = 27 * w + 3 * j + k
                if c == 0:
                    m[row, 2 * w] = coef                 # P even: g0
                elif c == 1:
                    m[row, 2 * w + 1] = coef             # P odd: g1
                    m[row, 128 + 2 * w] = coef           # Q even: g1
                else:
                    m[row, 128 + 2 * w + 1] = coef       # Q odd: g2
    return np.asarray(m, dtype=jnp.bfloat16)


#: expected upper-structure nibble per ``char & 7`` slot (see the checked
#: encode below): char is valid iff ``char & 0xD8 == 0x40 + nibble << 3``.
#: Slots {1,3,7} (A/C/G) -> 0, {6} (N) -> 1, {4,5} (T/U) -> 2; the invalid
#: slots {0,2} get 15, whose expected value 0xB8 carries bit 5 — which the
#: 0xD8 mask always clears — so they can never match.  Exact on all 256
#: bytes (proven against ops.validate in tests).
_B5_VEXP_LUT_U32 = (
    15 | (0 << 4) | (15 << 8) | (0 << 12)
    | (2 << 16) | (2 << 20) | (1 << 24) | (0 << 28)
)


def _encode_b5_inter_kernel_impl(x_ref, m_ref, o_ref, b_ref=None):
    x = x_ref[:].astype(jnp.int32)
    sh = (x & 7) << 2
    digits = (jnp.int32(spec.DIGIT_LUT8_U32) >> sh) & 0xF
    rb = digits.shape[0]
    if b_ref is not None:
        # fused validity: a byte is in {A,C,G,T,U,N} (either case) iff its
        # low 3 bits pick a live LUT slot AND its remaining structure bits
        # (0xD8 — bit 5 is case) match the one char that slot implies.
        # Six VPU ops per lane, reusing the digit LUT's shift — about half
        # the old round-trip-the-decode-char form (r02's 38% encode tax).
        vexp = 0x40 + (((jnp.int32(_B5_VEXP_LUT_U32) >> sh) & 0xF) << 3)
        bad = (x & 0xD8) ^ vexp
        # depth-5 pairwise OR tree over the 27 128-lane groups.  Measured
        # identical to the serial 26-OR chain (0.061 ms at R=4096 either
        # way — Mosaic evidently schedules both the same); kept in tree
        # form for depth.  The r04 tax A/B (DESIGN §5) localizes the cost
        # in the 6 check ops per byte lane, not the reduce: a 1-op check
        # with the same reduce measures a 13% tax — the floor for ANY
        # fused check — and the exact structure test has no known form
        # under 6 ops, so the <= 15% target is closed as infeasible.
        groups = [
            jax.lax.slice(bad, (0, 128 * g), (rb, 128 * (g + 1)))
            for g in range(B5_ROW_NT // 128)
        ]
        while len(groups) > 1:
            h = len(groups) // 2
            tail = [groups[2 * h]] if len(groups) & 1 else []
            groups = [
                groups[i] | groups[h + i] for i in range(h)
            ] + tail
        b_ref[:] = groups[0].astype(jnp.uint32)
    odd = (
        jax.lax.broadcasted_iota(jnp.int32, (rb, B5_ENC_GRP_U32), 1) & 1
    ) == 1
    for g in range(B5_ROW_NT // B5_ENC_GRP_NT):
        d = jax.lax.slice(
            digits, (0, B5_ENC_GRP_NT * g), (rb, B5_ENC_GRP_NT * (g + 1))
        ).astype(jnp.bfloat16)
        z = jnp.dot(
            d, m_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.int32).astype(jnp.uint32)
        p = jax.lax.slice(z, (0, 0), (rb, B5_ENC_GRP_U32))
        q = jax.lax.slice(z, (0, B5_ENC_GRP_U32), (rb, 2 * B5_ENC_GRP_U32))
        o_ref[:, B5_ENC_GRP_U32 * g : B5_ENC_GRP_U32 * (g + 1)] = jnp.where(
            odd, (p >> 11) | (q << 10), p | ((q & jnp.uint32(0x7FF)) << 21)
        )


def _encode_b5_inter_kernel(x_ref, m_ref, o_ref):
    _encode_b5_inter_kernel_impl(x_ref, m_ref, o_ref)


def _encode_b5_inter_checked_kernel(x_ref, m_ref, o_ref, b_ref):
    _encode_b5_inter_kernel_impl(x_ref, m_ref, o_ref, b_ref)


def encode_b5_panels_v2(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Encode u8[R, 3456] nt panels -> interleaved u32[R, 256] word stream.

    Lane pair ``(2w, 2w+1)`` is the little-endian u32 pair of u64 word
    ``128 r + w`` of the reference's base-5 stream
    (src/n_to_bits2.rs:44-53) — emitted directly by the kernel via a
    duplicated-column g-chunk matmul + parity select (see
    :func:`_b5_enc_mat_inter`); prefer :func:`encode_b5_planar` when the
    consumer is the planar decoder.
    """
    return _encode_b5_panels_call(x, checked=False, interpret=interpret)


def _encode_b5_panels_call(x: jax.Array, checked: bool, interpret: bool):
    """Shared pallas_call setup for the interleaved panel encoder (with or
    without the fused validity badplane output)."""
    if x.dtype != jnp.uint8 or x.ndim != 2 or x.shape[1] != B5_ROW_NT:
        raise TypeError(f"expected u8[R, {B5_ROW_NT}], got {x.dtype}{x.shape}")
    interpret = _auto_interpret(interpret)
    R = x.shape[0]
    # 512-row blocks amortize grid overhead: +2% measured at bench scale
    # (r05 A/B tools/tune_enc_pipe.py; a two-phase dot hoist added
    # nothing on top — only 2 g-chunks to overlap).  The checked variant
    # keeps 256: its validity mask adds block-sized temporaries.
    rb = _row_block8(R, 256 if checked else 512)
    m = _b5_enc_mat_inter()
    words_spec = pl.BlockSpec(
        (rb, B5_ROW_U32), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    words_shape = jax.ShapeDtypeStruct((R, B5_ROW_U32), jnp.uint32)
    if checked:
        kernel = _encode_b5_inter_checked_kernel
        out_specs = [
            words_spec,
            pl.BlockSpec((rb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [words_shape, jax.ShapeDtypeStruct((R, 128), jnp.uint32)]
    else:
        kernel = _encode_b5_inter_kernel
        out_specs, out_shape = words_spec, words_shape
    return pl.pallas_call(
        kernel,
        grid=(_cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec((rb, B5_ROW_NT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, m)


def encode_b5_panels_checked(
    x: jax.Array, *, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Fused base-5 encode + validity: u8[R, 3456] ->
    (interleaved u32[R, 256], badplane u32[R, 128]).

    Any nonzero bit in ``badplane[r]`` means row ``r`` has a byte outside
    {A,C,G,T,U,N} (either case).  The check rides the encode's single HBM
    read (one pass; a separate validate pass costs a second).
    """
    return _encode_b5_panels_call(x, checked=True, interpret=interpret)


def encode_b5_words_checked(
    x: jax.Array, *, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Fused words-API base-5 encode + validity flag:
    u8[..., L] (L % 27 == 0) -> (u32[..., 2*(L//27)], bool scalar).

    The flag is True iff ANY input byte is outside {A,C,G,T,U,N} (either
    case); panel padding is ``'A'`` (valid).  On a flagged batch, diagnose
    with :func:`..ops.validate.first_invalid` (the rare path).  Mirrors
    :func:`encode_b5_words_pallas`.
    """
    return _encode_b5_words_impl(x, checked=True, interpret=interpret)


# ---------------------------------------------------------------------------
# Base-5 decode v2: digit-pair scatter into nt4 u32 lanes (int8 MXU)
# ---------------------------------------------------------------------------
# The v1 decoder scatters three char planes to 432 u8 lanes per slice (24 MXU
# passes).  v2 scatters into the nt4 form instead — each output u32 lane
# holds 4 ASCII bytes — with ONE (768, 256) matmul per slice.  The scatter
# runs on the int8 MXU path (int8 x int8 -> i32 `jnp.dot` is exact on this
# chip and much faster than bf16 at these shapes): digits are <= 4 so they
# feed int8 directly, and because the 256 weight that would place the second
# byte of each 16-bit half does not fit int8, each half is scattered as a
# digit PAIR ``v = d_even + 8 * d_odd`` (weights {1, 8}, v <= 36; a half
# whose two nts straddle a triplet boundary simply sums entries from two
# t-lanes), then the VPU re-expands ``v -> (v & 7) | (v >> 3) << 8``.

@functools.lru_cache(maxsize=None)
def _b5_dec_scatter_pairs_i8():
    """digits concat [d0|d1|d2] (768,) int8 -> nt4 half PAIRS (256,):
    col m in [0,128) = lo half of nt4 lane m as d_even + 8*d_odd, col 128+m
    the hi half.  Columns 108..127 / 236..255 are all-zero (pad lanes)."""
    s = np.zeros((3 * B5_SLICE_WORDS * B5_TPAD, 256), np.int8)
    for w in range(B5_SLICE_WORDS):
        for j in range(9):
            for k in range(3):
                p = 27 * w + 3 * j + k          # nt position within slice
                m, b = divmod(p, 4)             # nt4 lane, byte
                col = m if b < 2 else 128 + m
                s[256 * k + B5_TPAD * w + j, col] = 1 if b % 2 == 0 else 8
    return s


@functools.lru_cache(maxsize=None)
def _b5_dec_scatter_quads_i8():
    """digits concat [d0|d1|d2] (768,) int8 -> nt4 digit QUADS (128,):
    col m = sum_b 5**b * digit(4m + b) — the whole u32 nt4 lane as one
    base-5 value v <= 624.  Half the dense MACs of the half-pair scatter
    (the r02 decode's dominant MXU term, 768x256 -> 768x128); the VPU
    re-derives the four digits with three exact multiply-shift divisions
    (the same constants as the triplet split, v < 625 < the 1024 exactness
    bound).  Weights {1, 5, 25, 125} all fit int8.  Columns 108..127 are
    all-zero (pad lanes -> digit 0 -> 'AAAA')."""
    s = np.zeros((3 * B5_SLICE_WORDS * B5_TPAD, 128), np.int8)
    for w in range(B5_SLICE_WORDS):
        for j in range(9):
            for k in range(3):
                p = 27 * w + 3 * j + k          # nt position within slice
                m, b = divmod(p, 4)             # nt4 lane, byte
                s[256 * k + B5_TPAD * w + j, m] = 5 ** b
    return s


def _swar_digits_to_chars(s: jax.Array) -> jax.Array:
    """Packed digits (4 per u32 lane, each byte 0..4) -> packed ASCII.

    Byte-parallel: char = 'A' + 2*d + 15*[d==2] + 5*[d==4]
    (A+0=A, A+2=C, A+4+15=T, A+6=G, A+8+5=N; no byte sum can carry).
    """
    one = jnp.uint32(0x01010101)
    s2 = s >> 2
    e2 = (s >> 1) & (~s) & (~s2) & one  # [d == 2]
    e4 = s2 & one                        # [d == 4]
    return (
        jnp.uint32(0x41414141) + (s << 1) + e2 * jnp.uint32(15) + e4 * jnp.uint32(5)
    )


#: padded nt4 panel width: 8 slices x 112 lanes (112 = 108 data + 4 pad)
B5_NT4_PAD_LANES = 8 * 112


#: bit offset of triplet j inside its starting BYTE: 7j mod 8
_B5_BYTE_SHIFT = {j: (7 * j) % 8 for j in range(9)}


@functools.lru_cache(maxsize=None)
def _b5_dec_gather_fold_bf16():
    """bf16 gather that folds the byte splice INTO the matmul (r03).

    t-col ``(w, j)`` holds ``byte_k * 2^(7-r) + byte_{k+1} * 2^(15-r)``
    with ``k = 7j // 8``, ``r = 7j mod 8`` — all-integer power-of-two
    weights, exact in bf16 (bytes <= 255 carry 8 significant bits; sums
    <= 255 * (2^7 + 2^14) < 2^24 accumulate exactly in f32) — so
    ``t = (i32(z) >> 7) & 0x7F`` needs NO -128 input offset, no per-column
    corrections and no variable-shift funnel: the whole splice is three
    cheap lane-uniform ops.  Same MXU cost as the r02 int8 byte-copy
    gather (half the columns at half the int8 rate) and measured +2.6%
    over it from the removed VPU work; the int8 gather itself was +18%
    over the original bf16 halves form.  Input rows index the 4 byte
    planes of a ``(rb, 32)`` interleaved slice (lane ``2w`` = lo u32 of
    word ``w``, ``2w+1`` = hi): byte ``k`` of word ``w`` sits at row
    ``32*(k%4) + 2w + [k>=4]`` — the de-interleave is absorbed into
    constant row indices (XLA's strided-slice de-interleave pass measured
    4x the decode kernel itself).
    """
    g = np.zeros((128, B5_SLICE_WORDS * B5_TPAD), np.float32)
    for w in range(B5_SLICE_WORDS):
        for j in range(9):
            k = (7 * j) // 8
            r = _B5_BYTE_SHIFT[j]
            g[32 * (k % 4) + 2 * w + (1 if k >= 4 else 0), B5_TPAD * w + j] = (
                float(1 << (7 - r))
            )
            if r > 0:
                k1 = k + 1
                g[
                    32 * (k1 % 4) + 2 * w + (1 if k1 >= 4 else 0),
                    B5_TPAD * w + j,
                ] = float(1 << (15 - r))
    return np.asarray(g, dtype=jnp.bfloat16)


def _decode_b5_inter_kernel_impl(
    x_ref, g_ref, s_ref, o_ref, b_ref=None, digits=False
):
    """Interleaved u32[rb, 256] words -> padded nt4 u32[rb, 896].

    Two r03 VPU trims (same-process A/B +6.9%, tools/tune_dec_vpu.py):
    byte-plane extraction is hoisted OUT of the slice loop (the mask/shift
    work runs once on full 256-lane arrays instead of eight times on
    32-lane ones that waste 96/128 register lanes per op), and the packed-
    digit word is assembled LINEARLY — ``pd = v + 251·v5 + 64256·v25 +
    16449536·v125`` (what the sub/shift/or chain algebraically expands to;
    3 mul + 3 add for 9 sub/shift/or, exact in i32: max < 2^27).

    The slice loop runs in TWO PHASES (r05): all 8 gather matmuls +
    triplet->digit splits first, then all 8 scatter matmuls + output
    assembly.  The r04 stage ablation showed the per-slice serial form
    executed gather/scatter/chars back-to-back with no overlap; making
    consecutive MXU gathers independent in the instruction stream lets
    Mosaic run slice g+1's gather under slice g's VPU tail — measured
    +11% chars / +17% digits at bench scale (tools/tune_dec_pipe.py,
    234 -> 260 / 319 GiB/s with ``digits``).

    ``digits=True`` emits the packed base-5 DIGIT word (4 digits per u32
    lane, each byte 0..4) instead of ASCII — the device format for
    digit-domain consumers (GC, k-mer extraction, translation), skipping
    the SWAR char conversion entirely.

    With ``b_ref`` the kernel additionally flags stream corruption on the
    decode's own HBM read (the decode mirror of the fused checked encode):
    the t domain already holds every triplet value, so ``t >= 125`` is one
    add+shift per t-lane — ``(t + 3) >> 7``, exact since t <= 127 — and
    the TPAD columns cannot false-positive (their gather columns are
    all-zero, so t = 0 there).  The u64 pad bit 63 is bit 31 of each odd
    (hi) u32 input lane.  Semantics identical to
    :func:`..ops.seqops.first_invalid_word_b5` (which diagnoses the word
    index on flagged batches — the rare path).
    """
    x = x_ref[:]
    rb = x.shape[0]
    m8 = jnp.uint32(0xFF)
    # x stays uint32 so the top-plane shift is logical (an i32-first
    # formulation sign-extends byte 3 and corrupts the gather)
    p0 = (x & m8).astype(jnp.int32).astype(jnp.bfloat16)
    p1 = ((x >> 8) & m8).astype(jnp.int32).astype(jnp.bfloat16)
    p2 = ((x >> 16) & m8).astype(jnp.int32).astype(jnp.bfloat16)
    p3 = (x >> 24).astype(jnp.int32).astype(jnp.bfloat16)
    bad = None
    digs_all = []
    for g in range(B5_SLICES):
        planes = jnp.concatenate(
            [
                jax.lax.slice(p, (0, 32 * g), (rb, 32 * (g + 1)))
                for p in (p0, p1, p2, p3)
            ],
            axis=1,
        )
        z = jnp.dot(planes, g_ref[:], preferred_element_type=jnp.float32)
        t = (z.astype(jnp.int32) >> 7) & 0x7F
        if b_ref is not None:
            badt = (t + 3) >> 7  # 1 iff triplet value >= 125
            bad = badt if bad is None else (bad | badt)
        q5 = (t * 205) >> 10
        q25 = (t * 41) >> 10
        digs_all.append(
            jnp.concatenate([t - 5 * q5, q5 - 5 * q25, q25], axis=1).astype(
                jnp.int8
            )
        )
    for g in range(B5_SLICES):
        # quad scatter: one base-5 value per nt4 lane (half the MACs of the
        # half-pair form); the VPU splits v = d0 + 5d1 + 25d2 + 125d3 back
        # with the exact multiply-shift chain (v <= 624 < the 1024 bound)
        v = jnp.dot(digs_all[g], s_ref[:], preferred_element_type=jnp.int32)
        v5 = (v * 205) >> 10
        v25 = (v * 41) >> 10
        v125 = (v25 * 205) >> 10
        pd = (v + 251 * v5 + 64256 * v25 + 16449536 * v125).astype(jnp.uint32)
        pd = jax.lax.slice(pd, (0, 0), (rb, 112))
        o_ref[:, 112 * g : 112 * (g + 1)] = (
            pd if digits else _swar_digits_to_chars(pd)
        )
    if b_ref is not None:
        odd = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) & 1
        bad = bad | (((x >> 31).astype(jnp.int32)) & odd)
        b_ref[:] = (
            jax.lax.slice(bad, (0, 0), (rb, 128))
            | jax.lax.slice(bad, (0, 128), (rb, 256))
        ).astype(jnp.uint32)


def _decode_b5_inter_kernel(x_ref, g_ref, s_ref, o_ref):
    _decode_b5_inter_kernel_impl(x_ref, g_ref, s_ref, o_ref)


def _decode_b5_inter_checked_kernel(x_ref, g_ref, s_ref, o_ref, b_ref):
    _decode_b5_inter_kernel_impl(x_ref, g_ref, s_ref, o_ref, b_ref)


def _decode_b5_inter_digits_kernel(x_ref, g_ref, s_ref, o_ref):
    _decode_b5_inter_kernel_impl(x_ref, g_ref, s_ref, o_ref, digits=True)


def decode_b5_interleaved_panels(
    words: jax.Array, *, interpret: bool = False, row_block: int = 512
) -> jax.Array:
    """Decode INTERLEAVED u32[R, 256] word panels -> padded nt4 u32[R, 896].

    Input row = 128 consecutive u64 words as their little-endian u32 pairs —
    exactly the reference's packed stream tiled 256 lanes per row, no
    planarization pass needed.  Output slice ``g`` occupies lanes
    ``[112 g, 112 g + 108)``; the 4 pad lanes decode as ``'AAAA'`` (see
    :func:`decode_b5_nt4_panels` on why 896 lanes: XLA's result-relayout
    copy).  This is the fast path behind :func:`decode_b5_bytes_pallas`.
    """
    return _decode_b5_inter_call(
        words, checked=False, interpret=interpret, row_block=row_block
    )


def decode_b5_interleaved_panels_checked(
    words: jax.Array, *, interpret: bool = False, row_block: int = 512
) -> tuple[jax.Array, jax.Array]:
    """Fused base-5 decode + stream-integrity check: interleaved
    u32[R, 256] -> (padded nt4 u32[R, 896], badplane u32[R, 128]).

    Any nonzero bit in ``badplane[r]`` means row ``r`` contains a corrupt
    u64 word (a triplet value >= 125 or pad bit 63 set) — the semantics of
    :func:`..ops.seqops.first_invalid_word_b5`, but riding the decode's
    own HBM read instead of a second whole-stream pass.  Diagnose flagged
    rows with that scan (the rare path).
    """
    return _decode_b5_inter_call(
        words, checked=True, interpret=interpret, row_block=row_block
    )


def decode_b5_digits_panels(
    words: jax.Array, *, interpret: bool = False, row_block: int = 512
) -> jax.Array:
    """Decode interleaved u32[R, 256] word panels -> padded base-5 DIGIT
    nt4 panels u32[R, 896] (4 digit bytes per lane, each byte 0..4).

    The digit-domain device format (r05): identical layout to
    :func:`decode_b5_interleaved_panels` but each byte holds the base-5
    digit (A=0 C=1 T=2 G=3 N=4, the ``spec.DIG_TO_CHAR_B5`` order) instead of
    its ASCII char.  Skipping the SWAR char conversion and its register
    pressure runs at 319 GiB/s vs the char form's 260 (bench-scale A/B,
    tools/tune_dec_pipe.py) — digit consumers (GC, composition, k-mer /
    translation pipelines) should take this and convert only at the
    boundary (:func:`digit_panels_to_chars`, one XLA elementwise pass).
    Matches the reference's decode slot `bits_to_n2_pdep`
    (reference src/n_to_bits2.rs:196-268) one representation earlier.
    """
    return _decode_b5_inter_call(
        words, checked=False, interpret=interpret, row_block=row_block,
        digits=True,
    )


def digit_panels_to_chars(panels: jax.Array) -> jax.Array:
    """Packed base-5 digit panels (u32, any shape) -> packed ASCII panels.

    The boundary conversion for :func:`decode_b5_digits_panels` output —
    one elementwise XLA pass (the same byte-parallel mapping the char
    decode kernel fuses); layouts and padding are preserved.
    """
    return _swar_digits_to_chars(panels)


def _decode_b5_inter_call(
    words: jax.Array, *, checked: bool, interpret: bool, row_block: int,
    digits: bool = False,
):
    if checked and digits:
        raise ValueError(
            "checked digit-domain decode is not implemented: the checked "
            "kernel emits char panels (use decode_b5_interleaved_panels_"
            "checked, or decode_b5_digits_panels without the fused check)"
        )
    if words.dtype != jnp.uint32 or words.ndim != 2 or words.shape[1] != 2 * B5_ROW_WORDS:
        raise TypeError(f"expected u32[R, {2 * B5_ROW_WORDS}], got {words.dtype}{words.shape}")
    interpret = _auto_interpret(interpret)
    R = words.shape[0]
    rb = _row_block8(R, row_block)
    mats = (_b5_dec_gather_fold_bf16(), _b5_dec_scatter_quads_i8())
    mat_specs = [
        pl.BlockSpec(m.shape, lambda i, nd=m.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for m in mats
    ]
    panels_spec = pl.BlockSpec(
        (rb, B5_NT4_PAD_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    panels_shape = jax.ShapeDtypeStruct((R, B5_NT4_PAD_LANES), jnp.uint32)
    if checked:
        kernel = _decode_b5_inter_checked_kernel
        out_specs = [
            panels_spec,
            pl.BlockSpec((rb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [panels_shape, jax.ShapeDtypeStruct((R, 128), jnp.uint32)]
    elif digits:
        kernel = _decode_b5_inter_digits_kernel
        out_specs, out_shape = panels_spec, panels_shape
    else:
        kernel = _decode_b5_inter_kernel
        out_specs, out_shape = panels_spec, panels_shape
    return pl.pallas_call(
        kernel,
        grid=(_cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec((rb, 2 * B5_ROW_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *mat_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(words, *mats)


# --- base-5 GC content: the decode's triplet extraction, then 8 VPU ops --


def _gc_b5_inter_kernel(x_ref, g_ref, o_ref):
    """Interleaved u32[rb, 256] base-5 words -> per-row GC count i32[rb, 1].

    GC count on the packed base-5 stream without a decode pass: ride the
    decoder's bf16 gather-fold (:func:`_b5_dec_gather_fold_bf16`) to land
    every 7-bit triplet value ``t`` on its own lane — the hard part of any
    base-5 digit walk, done here by the MXU — then the parity shortcut of
    ``seqops.gc_content_packed_b5`` (digit low bits are XORs of the two
    multiply-shift quotients: ``gc = (t^u)&1 + (u^v)&1 + v&1`` with
    ``u = t//5``, ``v = t//25``) costs ~10 VPU lane-ops per t-lane.  The
    scatter matmul, digit split and char mapping of the full decode (all
    of its int8 MXU time and most of its VPU time) are skipped.  TPAD
    columns gather ``t = 0`` ('AAA') and contribute 0 — no masking; all-
    zero pad WORDS are 'AAA' triplets too, so zero-padded ragged streams
    need no mask either.  Output is the per-row lane reduction (4 B/row of
    HBM write vs 1 KiB read).
    """
    x = x_ref[:]
    rb = x.shape[0]
    m8 = jnp.uint32(0xFF)
    p0 = (x & m8).astype(jnp.int32).astype(jnp.bfloat16)
    p1 = ((x >> 8) & m8).astype(jnp.int32).astype(jnp.bfloat16)
    p2 = ((x >> 16) & m8).astype(jnp.int32).astype(jnp.bfloat16)
    p3 = (x >> 24).astype(jnp.int32).astype(jnp.bfloat16)
    acc = jnp.zeros((rb, 2 * B5_ROW_WORDS), jnp.int32)
    for g in range(B5_SLICES):
        planes = jnp.concatenate(
            [
                jax.lax.slice(p, (0, 32 * g), (rb, 32 * (g + 1)))
                for p in (p0, p1, p2, p3)
            ],
            axis=1,
        )
        z = jnp.dot(planes, g_ref[:], preferred_element_type=jnp.float32)
        t = (z.astype(jnp.int32) >> 7) & 0x7F
        u = (t * 205) >> 10
        v = (t * 41) >> 10
        acc += ((t ^ u) & 1) + ((u ^ v) & 1) + (v & 1)
    o_ref[:, 0] = jnp.sum(acc, axis=1)


def gc_b5_row_sums(
    words: jax.Array, *, interpret: bool = False, row_block: int = 512
) -> jax.Array:
    """Per-row GC counts of interleaved u32[R, 256] panels -> i32[R]."""
    if (
        words.dtype != jnp.uint32
        or words.ndim != 2
        or words.shape[1] != 2 * B5_ROW_WORDS
    ):
        raise TypeError(
            f"expected u32[R, {2 * B5_ROW_WORDS}], got {words.dtype}{words.shape}"
        )
    interpret = _auto_interpret(interpret)
    R = words.shape[0]
    rb = _row_block8(R, row_block)
    g = _b5_dec_gather_fold_bf16()
    out = pl.pallas_call(
        _gc_b5_inter_kernel,
        grid=(_cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec(
                (rb, 2 * B5_ROW_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(g.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.int32),
        interpret=interpret,
    )(words, g)
    return out[:, 0]


def gc_content_b5_stream_pallas(
    words: jax.Array, *, interpret: bool = False, row_block: int = 512
) -> jax.Array:
    """GC count of one flat interleaved base-5 u32[2W] stream -> i32 scalar.

    The Pallas fast path behind ``seqops.gc_content_packed_b5`` for long
    flat streams: zero-pads to whole 3456-nt panel rows (zero words decode
    as 'AAA' — GC 0 — so padding needs no mask) and sums the per-row
    kernel counts.  Bit-identical to the XLA lane-parity form.
    """
    if words.dtype != jnp.uint32 or words.ndim != 1:
        raise TypeError(f"expected flat u32 stream, got {words.dtype}{words.shape}")
    lw = 2 * B5_ROW_WORDS
    R = max(_cdiv(words.shape[0], lw), 1)
    pad = R * lw - words.shape[0]
    if pad:
        words = jnp.concatenate([words, jnp.zeros((pad,), jnp.uint32)])
    return jnp.sum(
        gc_b5_row_sums(
            words.reshape(R, lw), interpret=interpret, row_block=row_block
        )
    )


# --- minimizer scan -----------------------------------------------------

MZ_ROW_WORDS = 1024   # own u32 words per kernel row = 16384 nt
MZ_OV = 128           # lead/trail overlap words: window + k-mer taps <= 2048 nt


def _minimizer_kernel(k: int, w: int, canonical: bool, n: int):
    """Fused (w, k)-minimizer mask kernel: packed 2-bit words in, packed
    minimizer bits out — nothing per-position ever touches HBM.

    The r03 XLA form ran at 59 Mnt/s because its two log-depth windowed
    passes shift a FLAT 8-Mnt hash array: every 1-position shift of a 1-D
    stream is a sublane-crossing relayout, ~16 of them, each a full HBM
    round trip (DESIGN §4 rule 2).  Here the hash stream lives as sixteen
    s-planes in VMEM — plane ``s`` holds the hash of position ``16 l + s``
    at lane ``l`` — so a shift by ``m`` positions is a plane permutation
    plus a 0/1-lane in-row slice, and the whole windowed-min doubling tree
    is ~log2(w) VPU ops per plane.  Stages: funnel k-mer codes (the
    :func:`..ops.kmer.kmer_codes` window), SWAR reverse-complement fold
    (``canonical``), Murmur3 fmix32, forward windowed min (zeroing window
    starts past ``n - w``), backward windowed max, equality mask packed 16
    bits per word.  Semantics bit-identical to ``ops.kmer.minimizers``.
    """
    r = w - 1
    kmask_v = (1 << (2 * k)) - 1
    aa_v = 0xAAAAAAAA >> (32 - 2 * k)
    rsh = 32 - 2 * k
    L = MZ_ROW_WORDS + 2 * MZ_OV

    def plane_shift(planes, m, left, pad):
        """View of the s-planes shifted by ``m`` positions (right when
        ``left`` is False): V_s[l] = P[(s±m) mod 16][l + (s±m)//16]."""
        rb = planes[0].shape[0]
        dt = planes[0].dtype
        out = []
        for s in range(16):
            t = s - m if left else s + m
            sp, q = t % 16, t // 16  # floor div: q <= 0 for left shifts
            p = planes[sp]
            if q == 0:
                out.append(p)
            elif q > 0:
                out.append(
                    jnp.concatenate(
                        [
                            jax.lax.slice(p, (0, q), (rb, L)),
                            jnp.full((rb, q), pad, dt),
                        ],
                        axis=1,
                    )
                )
            else:
                out.append(
                    jnp.concatenate(
                        [
                            jnp.full((rb, -q), pad, dt),
                            jax.lax.slice(p, (0, 0), (rb, L + q)),
                        ],
                        axis=1,
                    )
                )
        return out

    def windowed(planes, op, pad, left):
        t, m = planes, 1
        while 2 * m - 1 <= r:
            t = [op(a, b) for a, b in zip(t, plane_shift(t, m, left, pad))]
            m *= 2
        off = r - (m - 1)
        if off:
            t = [op(a, b) for a, b in zip(t, plane_shift(t, off, left, pad))]
        return t

    def kernel(x_ref, o_ref):
        kmask = jnp.uint32(kmask_v)
        aa = jnp.uint32(aa_v)
        x = x_ref[:]
        rb = x.shape[0]
        nxt = jnp.concatenate(
            [
                jax.lax.slice(x, (0, 1), (rb, L)),
                jnp.zeros((rb, 1), jnp.uint32),
            ],
            axis=1,
        )
        planes = []
        for s in range(16):
            win = (x >> (2 * s)) | (nxt << (32 - 2 * s)) if s else x
            c = win & kmask
            if canonical:
                rc = c ^ aa
                rc = ((rc & jnp.uint32(0x33333333)) << 2) | (
                    (rc >> 2) & jnp.uint32(0x33333333)
                )
                rc = ((rc & jnp.uint32(0x0F0F0F0F)) << 4) | (
                    (rc >> 4) & jnp.uint32(0x0F0F0F0F)
                )
                rc = ((rc & jnp.uint32(0x00FF00FF)) << 8) | (
                    (rc >> 8) & jnp.uint32(0x00FF00FF)
                )
                rc = ((rc << 16) | (rc >> 16)) >> rsh
                # codes are 2k <= 30 bits: signed min is exact (Mosaic has
                # no unsigned vector min — arith.minui fails to legalize)
                c = jnp.minimum(
                    c.astype(jnp.int32), rc.astype(jnp.int32)
                ).astype(jnp.uint32)
            h = c ^ (c >> 16)
            h = h * jnp.uint32(0x85EBCA6B)
            h = h ^ (h >> 13)
            h = h * jnp.uint32(0xC2B2AE35)
            h = h ^ (h >> 16)
            # sign-flip order isomorphism: unsigned compare on h == signed
            # compare on h ^ 0x8000_0000 (same Mosaic minui gap as above)
            planes.append((h ^ jnp.uint32(0x80000000)).astype(jnp.int32))
        # forward: wm_s[l] = min hash of the window STARTING at 16l + s
        wm = windowed(
            planes, jnp.minimum, jnp.int32(0x7FFFFFFF), left=False
        )
        # zero window starts outside [0, n - w] so they never win the max
        # (global word index: rows are MZ_ROW_WORDS-word stream chunks and
        # panel lane 0 sits MZ_OV words before the row's own block)
        row0 = pl.program_id(0) * rb
        word_g = (
            (row0 + jax.lax.broadcasted_iota(jnp.int32, (rb, L), 0))
            * MZ_ROW_WORDS
            + jax.lax.broadcasted_iota(jnp.int32, (rb, L), 1)
            - MZ_OV
        )
        gp16 = 16 * word_g
        wm = [
            jnp.where(
                (gp16 + s >= 0) & (gp16 + s <= n - w),
                p,
                jnp.int32(-0x80000000),  # flipped u32 zero: never wins max
            )
            for s, p in enumerate(wm)
        ]
        # backward: best_s[l] = max window-min among windows CONTAINING
        # position 16l + s
        best = windowed(
            wm, jnp.maximum, jnp.int32(-0x80000000), left=True
        )
        bits = jnp.zeros((rb, L), jnp.uint32)
        for s in range(16):
            bits = bits | (
                (planes[s] == best[s]).astype(jnp.uint32) << s
            )
        o_ref[:] = jax.lax.slice(bits, (0, MZ_OV), (rb, MZ_OV + MZ_ROW_WORDS))

    return kernel


def minimizer_bits_panels(
    x: jax.Array,
    k: int,
    w: int,
    n: int,
    *,
    canonical: bool = True,
    interpret: bool = False,
    row_block: int = 8,
) -> jax.Array:
    """Overlapping packed panels u32[R, 1280] -> minimizer bits
    u32[R, 1024]: bit ``s`` of lane ``(r, l)`` flags position
    ``16*(1024 r + l) + s`` as a (w, k)-minimizer (``n`` = total position
    count; starts past ``n - w`` never define a window).  Rows carry 128
    lead words (predecessor tail) and 128 trail words (successor head).
    """
    interpret = _auto_interpret(interpret)
    lanes = MZ_ROW_WORDS + 2 * MZ_OV
    if x.dtype != jnp.uint32 or x.ndim != 2 or x.shape[1] != lanes:
        raise TypeError(f"expected u32[R, {lanes}], got {x.dtype}{x.shape}")
    if not 1 <= k <= 15:
        raise ValueError("kernel minimizers cover k in [1, 15]")
    if not 1 <= w - 1 <= 16 * MZ_OV - k:
        raise ValueError(f"window w out of kernel range (got {w})")
    R = x.shape[0]
    rb = _row_block8(R, row_block)
    return pl.pallas_call(
        _minimizer_kernel(k, w, bool(canonical), n),
        grid=(_cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec((rb, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (rb, MZ_ROW_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, MZ_ROW_WORDS), jnp.uint32),
        interpret=interpret,
    )(x)


# --- base-5 packed pattern search scan ---------------------------------

B5_SEARCH_WORDS = 512   # u64 words per kernel row = 13824 nt
B5_SEARCH_OVW = 128     # overlap words per row (bounds the max tap offset)


@functools.lru_cache(maxsize=None)
def _b5_deint_mats_bf16():
    """Even/odd lane-select byte-pair fold matrices (512, 128), bf16.

    ``concat([byte_plane_a, byte_plane_b], axis=1) @ We`` lands
    ``a[2w] + 256 * b[2w]`` on column ``w`` (the lo u32 of u64 word ``w``
    as one 16-bit half); ``Wo`` does the odd (hi) lanes.  Exact in
    bf16/f32: inputs <= 255 (8 significant bits), weights are powers of
    two, sums < 2^16 < the 2^24 f32-accumulation bound.  This is the
    search scan's de-interleave: XLA's strided-slice de-interleave pass
    is the DESIGN §4 rule-2 anti-pattern the r03 XLA tier paid 94% of its
    time for; here the MXU absorbs it at the same MAC cost as the decode
    gather.
    """
    we = np.zeros((512, 128), np.float32)
    wo = np.zeros((512, 128), np.float32)
    for w in range(128):
        we[2 * w, w] = 1.0
        we[256 + 2 * w, w] = 256.0
        wo[2 * w + 1, w] = 1.0
        wo[256 + 2 * w + 1, w] = 256.0
    return (
        np.asarray(we, dtype=jnp.bfloat16),
        np.asarray(wo, dtype=jnp.bfloat16),
    )


def _match_b5_kernel(qc: tuple, n: int | None = None):
    """Build the base-5 search kernel for a compiled query ``qc`` =
    ((q8 ints, care8 ints) per phase 0..2), baked in as constants;
    ``n`` (when given) clears match bits at start positions >= n
    in-kernel (see :func:`match_b5_bits_rows`).

    Interleaved u32[rb, 2*(512+128)] word panels -> packed match bits
    u32[rb, 512]: bit ``3j + phase`` of lane ``w`` flags a query match at
    nucleotide ``27 w + 3 j + phase`` of the row (triplet ``j`` of u64
    word ``w``, start phase ``phase``).  Three stages, none leaving VMEM:

    1. de-interleave by MXU (:func:`_b5_deint_mats_bf16`): per 256-lane
       chunk, four (rb,512)@(512,128) dots rebuild planar lo/hi u32 words;
    2. nine VPU funnel shifts extract triplet ``j`` of every word and two
       exact multiply-shift divisions (the decoder's Lemire constants,
       reference src/n_to_bits2.rs:210-211) isolate its digits into
       base-8 slots -> ``t8[j]`` (rb, 640);
    3. the phase fold: a match starting at triplet ``u = 9w + j`` with
       phase ``p`` compares stream triplet ``u + i`` against ``q8[p][i]``
       — group ``j`` tap ``i`` is the in-row static slice
       ``t8[(j+i) % 9][:, (j+i)//9 :][..., :512]``, XOR + care-AND + OR,
       exactly the 2-bit scan's funnel-compare idiom (no gathers, no
       relayouts).
    """
    nchunks = (B5_SEARCH_WORDS + B5_SEARCH_OVW) // 128  # 5

    def kernel(b_ref, h_ref, we_ref, wo_ref, o_ref):
        # the halo (2 * B5_SEARCH_OVW = 256 lanes) is exactly the last
        # de-interleave chunk, so base and halo keep separate byte planes
        # — concatenating them into one (rb, 1280) value measured a
        # scoped-VMEM stack OOM at rb = 64 (the materialized copy defeats
        # Mosaic's lazy ref slicing)
        b = b_ref[:]
        h = h_ref[:]
        rb = b.shape[0]
        m8 = jnp.uint32(0xFF)

        def planes(x):
            return (
                (x & m8).astype(jnp.int32).astype(jnp.bfloat16),
                ((x >> 8) & m8).astype(jnp.int32).astype(jnp.bfloat16),
                ((x >> 16) & m8).astype(jnp.int32).astype(jnp.bfloat16),
                (x >> 24).astype(jnp.int32).astype(jnp.bfloat16),
            )

        pb = planes(b)
        ph = planes(h)
        groups: list[list] = [[] for _ in range(9)]
        for c in range(nchunks):
            if 256 * (c + 1) <= 2 * B5_SEARCH_WORDS:
                sl = lambda k: jax.lax.slice(
                    pb[k], (0, 256 * c), (rb, 256 * (c + 1))
                )
            else:  # the halo chunk
                sl = lambda k: ph[k]
            a01 = jnp.concatenate([sl(0), sl(1)], axis=1)
            a23 = jnp.concatenate([sl(2), sl(3)], axis=1)
            lo16 = jnp.dot(a01, we_ref[:], preferred_element_type=jnp.float32)
            lo32 = jnp.dot(a23, we_ref[:], preferred_element_type=jnp.float32)
            hi16 = jnp.dot(a01, wo_ref[:], preferred_element_type=jnp.float32)
            hi32 = jnp.dot(a23, wo_ref[:], preferred_element_type=jnp.float32)
            lo = lo16.astype(jnp.int32).astype(jnp.uint32) | (
                lo32.astype(jnp.int32).astype(jnp.uint32) << 16
            )
            hi = hi16.astype(jnp.int32).astype(jnp.uint32) | (
                hi32.astype(jnp.int32).astype(jnp.uint32) << 16
            )
            for j in range(9):
                b = 7 * j
                if b + 7 <= 32:
                    t = lo >> b if b else lo
                elif b >= 32:
                    t = hi >> (b - 32)
                else:
                    t = (lo >> b) | (hi << (32 - b))
                t = t & jnp.uint32(0x7F)
                t5 = (t * jnp.uint32(205)) >> 10
                t25 = (t * jnp.uint32(41)) >> 10
                groups[j].append(
                    (t - 5 * t5) | ((t5 - 5 * t25) << 3) | (t25 << 6)
                )
        t8 = [jnp.concatenate(cols, axis=1) for cols in groups]
        W = B5_SEARCH_WORDS

        def fold(tap_sel):
            """OR-fold the selected taps of every (j, phase) combo:
            ``tap_sel(phase) -> iterable of tap indices``."""
            bits = jnp.zeros((rb, W), jnp.uint32)
            for j in range(9):
                for phase in range(3):
                    q8, care8 = qc[phase]
                    diff = None
                    for i in tap_sel(phase):
                        qv, cv = q8[i], care8[i]
                        if not cv:
                            continue
                        jj, off = (j + i) % 9, (j + i) // 9
                        d = (
                            jax.lax.slice(t8[jj], (0, off), (rb, off + W))
                            ^ jnp.uint32(qv)
                        ) & jnp.uint32(cv)
                        diff = d if diff is None else diff | d
                    hit = (
                        jnp.ones((rb, W), jnp.uint32)
                        if diff is None
                        else (diff == 0).astype(jnp.uint32)
                    )
                    bits = bits | (hit << (3 * j + phase))
            return bits

        def clear_tail(bits, row0):
            if n is None:
                return bits
            # clear starts past n - 1: bit b of lane (r, w) is position
            # 27 * (W * (row0 + r) + w) + b
            lane_base = 27 * (
                (row0 + jax.lax.broadcasted_iota(jnp.int32, (rb, W), 0)) * W
                + jax.lax.broadcasted_iota(jnp.int32, (rb, W), 1)
            )
            v = jnp.clip(n - lane_base, 0, 27).astype(jnp.uint32)
            return bits & ((jnp.uint32(1) << v) - 1)

        row0 = pl.program_id(0) * rb
        # long queries take the 2-bit scan's r05 anchor prefilter, base-5
        # style: per phase, the _B5_ANCHOR_TAPS highest-popcount(care8)
        # taps fold first (~12 nt of constraint -> candidates are
        # ~4^-12-sparse per position on non-repetitive data); the
        # remaining taps fold only in blocks holding a candidate
        anchors = _b5_anchor_taps(qc)
        if anchors is None:
            o_ref[:] = clear_tail(fold(lambda p: range(len(qc[p][0]))), row0)
            return
        bits0 = fold(lambda p: anchors[p])
        o_ref[:] = jnp.zeros((rb, W), jnp.uint32)

        @pl.when(jnp.any(bits0 != 0))
        def _():
            rest = [
                [i for i in range(len(qc[p][0])) if i not in anchors[p]]
                for p in range(3)
            ]
            o_ref[:] = clear_tail(bits0 & fold(lambda p: rest[p]), row0)

    return kernel


#: anchor taps per phase for the base-5 prefilter (~4 triplets = 12 nt)
_B5_ANCHOR_TAPS = 4


def _b5_anchor_taps(qc: tuple) -> tuple | None:
    """Per-phase anchor tap indices for the prefilter, or None when the
    query is short enough that a split would cost more than it saves
    (every phase's non-anchor remainder must be substantial)."""
    taps = []
    for q8, care8 in qc:
        order = sorted(
            range(len(care8)),
            key=lambda i: bin(care8[i]).count("1"),
            reverse=True,
        )
        taps.append(frozenset(order[:_B5_ANCHOR_TAPS]))
    min_rest = min(len(qc[p][0]) - len(taps[p]) for p in range(3))
    if min_rest < _B5_ANCHOR_TAPS:
        return None
    return tuple(taps)


def match_b5_bits_panels(
    x: jax.Array, qc: tuple, *, interpret: bool = False, row_block: int = 32
) -> jax.Array:
    """Interleaved base-5 panels u32[R, 2*(512+128)] -> packed match bits
    u32[R, 512] for the compiled query ``qc`` (see :func:`_match_b5_kernel`
    for the bit contract).  Rows carry 128 overlap words (the next row's
    first 256 u32 lanes), bounding queries at ``9 * 128 - 8`` triplets.
    Compat shim over :func:`match_b5_bits_rows` (no valid-start clear).
    """
    lanes = 2 * (B5_SEARCH_WORDS + B5_SEARCH_OVW)
    if x.dtype != jnp.uint32 or x.ndim != 2 or x.shape[1] != lanes:
        raise TypeError(f"expected u32[R, {lanes}], got {x.dtype}{x.shape}")
    W2 = 2 * B5_SEARCH_WORDS
    return match_b5_bits_rows(
        x[:, :W2], x[:, W2:], qc, None,
        interpret=interpret, row_block=row_block,
    )


def match_b5_bits_rows(
    base: jax.Array,
    halo: jax.Array,
    qc: tuple,
    n: int | None = None,
    *,
    interpret: bool = False,
    row_block: int = 32,
) -> jax.Array:
    """(base u32[R, 1024], halo u32[R, 256]) -> packed match bits
    u32[R, 512].  ``halo[r]`` = the next row's first 256 u32 lanes (zeros
    beyond the stream); keeping it as its own quarter-size array instead
    of materializing overlap panels saves the 1.25x HBM copy, and ``n``
    (when given) fuses the valid-start tail clear into the kernel — the
    same two wrapper passes the 2-bit scan shed in r04.

    ``row_block`` defaults to 32: larger blocks measured only ~6% faster
    (75.5 -> 80.3 GiB/s at rb=128) and rb=64 NONDETERMINISTICALLY tripped
    Mosaic's 16 MB scoped-vmem stack limit under jit composition (a
    31 MB demand that did not reproduce across identical compiles) — the
    smaller block keeps 2x headroom under the worst observed lowering.
    """
    interpret = _auto_interpret(interpret)
    W2 = 2 * B5_SEARCH_WORDS
    OV2 = 2 * B5_SEARCH_OVW
    if (
        base.dtype != jnp.uint32
        or base.ndim != 2
        or base.shape[1] != W2
        or halo.shape != (base.shape[0], OV2)
    ):
        raise TypeError(
            f"expected u32[R, {W2}] + u32[R, {OV2}], got "
            f"{base.shape}/{halo.shape}"
        )
    R = base.shape[0]
    rb = _row_block8(R, row_block)
    we, wo = _b5_deint_mats_bf16()
    return pl.pallas_call(
        _match_b5_kernel(qc, n),
        grid=(_cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec((rb, W2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, OV2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(we.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wo.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rb, B5_SEARCH_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, B5_SEARCH_WORDS), jnp.uint32),
        interpret=interpret,
        # the r05 prefilter keeps bits0 live across the pl.when branch,
        # which tipped the default 16 MiB scoped-vmem stack by ~312 KiB
        # at bench scale (same class of nondeterministic demand as the
        # rb=64 note above); raise the budget as ops/sort.py does
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
    )(base, halo, we, wo)


def _decode_b5_nt4_kernel(padded: bool):
    ow = 112 if padded else 108  # output lanes consumed per slice

    def kernel(lo_ref, hi_ref, pa_ref, pb_ref, s_ref, o_ref):
        lo = lo_ref[:]
        hi = hi_ref[:]
        rb = lo.shape[0]
        tshape = (rb, B5_SLICE_WORDS * B5_TPAD)
        svec = _b5_trip_shift_vec(tshape)
        m16 = jnp.uint32(0xFFFF)
        for g in range(B5_SLICES):
            lo_g = jax.lax.slice(lo, (0, 16 * g), (rb, 16 * (g + 1)))
            hi_g = jax.lax.slice(hi, (0, 16 * g), (rb, 16 * (g + 1)))
            h = [lo_g & m16, lo_g >> 16, hi_g & m16, hi_g >> 16]
            m8 = jnp.uint32(0xFF)
            halves = jnp.concatenate(
                [x & m8 for x in h] + [x >> 8 for x in h], axis=1
            ).astype(jnp.int32).astype(jnp.bfloat16)
            a = jnp.dot(halves, pa_ref[:], preferred_element_type=jnp.float32)
            b = jnp.dot(halves, pb_ref[:], preferred_element_type=jnp.float32)
            ai = a.astype(jnp.int32)
            bi = b.astype(jnp.int32)
            t = ((ai >> svec) | (bi << (16 - svec))) & 0x7F
            q5 = (t * 205) >> 10
            q25 = (t * 41) >> 10
            # scatter DIGITS (<= 4, int8-exact); ASCII conversion happens
            # byte-parallel on the packed nt4 lanes afterwards (far fewer regs)
            digs = jnp.concatenate(
                [t - 5 * q5, q5 - 5 * q25, q25], axis=1
            ).astype(jnp.int8)
            zv = jnp.dot(digs, s_ref[:], preferred_element_type=jnp.int32)
            hp = (zv & 7) | ((zv >> 3) << 8)
            # pad lanes (cols 108..111) read the scatter's all-zero columns,
            # so in padded mode they deterministically decode to 'AAAA'
            pd = (
                jax.lax.slice(hp, (0, 0), (rb, ow))
                | (jax.lax.slice(hp, (0, 128), (rb, 128 + ow)) << 16)
            ).astype(jnp.uint32)
            o_ref[:, ow * g : ow * (g + 1)] = _swar_digits_to_chars(pd)

    return kernel


def decode_b5_nt4_panels(
    lo: jax.Array,
    hi: jax.Array,
    *,
    padded: bool = True,
    interpret: bool = False,
    row_block: int = 256,
) -> jax.Array:
    """Decode planar u32[R, 128] planes -> nt4 u32 panels.

    The output's little-endian byte stream is the ASCII nucleotide stream
    (one u32 lane = 4 chars) — the canonical device form; a host
    ``ndarray.view(uint8)`` recovers bytes for free.

    ``padded=True`` (the default): u32[R, 896] where slice ``g`` of the row
    occupies lanes ``[112 g, 112 g + 108)`` and the 4 pad lanes decode as
    ``'AAAA'`` — 896 = 7*128 keeps the row tile-aligned so XLA never
    inserts a relayout copy on the result (:func:`depad_nt4_host` strips
    the pad in one host memcpy pass).  ``padded=False``: u32[R, 864], the
    compact stream — for u32[R, 864] results XLA prefers a {0,1} layout
    and pays a full extra HBM round-trip to convert (measured ~30% of the
    op), so opt in only when a device consumer needs the compact layout.
    """
    if lo.shape != hi.shape or lo.ndim != 2 or lo.shape[1] != B5_ROW_WORDS:
        raise TypeError(f"expected u32[R, {B5_ROW_WORDS}] planes, got {lo.shape}/{hi.shape}")
    interpret = _auto_interpret(interpret)
    R = lo.shape[0]
    rb = _row_block8(R, row_block)
    out_w = B5_NT4_PAD_LANES if padded else B5_ROW_NT // 4
    mats = (*_b5_dec_mats()[:2], _b5_dec_scatter_pairs_i8())
    mat_specs = [
        pl.BlockSpec(m.shape, lambda i, nd=m.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for m in mats
    ]
    return pl.pallas_call(
        _decode_b5_nt4_kernel(padded),
        grid=(_cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec((rb, B5_ROW_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, B5_ROW_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *mat_specs,
        ],
        out_specs=pl.BlockSpec((rb, out_w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, out_w), jnp.uint32),
        interpret=interpret,
    )(lo, hi, *mats)


# ---------------------------------------------------------------------------
# 2-bit decode, SWAR variant
# ---------------------------------------------------------------------------
# unpack4 via byte-parallel arithmetic inside each u32 lane instead of four
# LUT lookups: two masked multiplies spread the four 2-bit codes to their
# byte positions with disjoint shifted copies (codes 0,2 via *(1|1<<12),
# codes 1,3 via *(1<<6|1<<18) — ranges never overlap, so the multiply's
# additions cannot carry), then chars = 'AAAA' + 2*code + 15*[code==2]
# byte-locally (A+0=A, A+2=C, A+4+15=T, A+6=G; max byte 84, no carries).
# Roughly half the VPU ops of the shuffle variant — the TPU descendant of
# the reference's pdep spread (src/n_to_bits.rs:327-330).

_SPREAD_MUL_02 = (1 << 0) | (1 << 12)
_SPREAD_MUL_13 = (1 << 6) | (1 << 18)


def _unpack4_swar(b: jax.Array) -> jax.Array:
    m1 = (b & jnp.uint32(0x33)) * jnp.uint32(_SPREAD_MUL_02)
    m2 = (b & jnp.uint32(0xCC)) * jnp.uint32(_SPREAD_MUL_13)
    s = (m1 | m2) & jnp.uint32(0x03030303)
    e = (s >> 1) & (~s) & jnp.uint32(0x01010101)  # [code == 2] per byte
    return jnp.uint32(0x41414141) + (s << 1) + e * jnp.uint32(15)


_UNPACK4["swar"] = _unpack4_swar
DECODE_2BIT_VARIANTS = ("shuffle", "select", "swar")


# Back-compat alias: the piece-matmul v1 encoder was superseded by the
# aligned g-chunk v2 (faster and immune to the sub-register miscompile).
encode_b5_panels = encode_b5_panels_v2


def b5_kernel_macs(kernel: str) -> tuple[int, int]:
    """Dense MXU cost of one 3456-nt row: ``(int8_macs, bf16_macs)``.

    The constant matrices are block-diagonal but the MXU's dense cost is
    ``K x N`` per matmul regardless of sparsity — this is the number the
    compute roofline (utils/profiling.Roofline) needs.  Kernels:
    ``enc_inter`` (the interleaved champion + its checked variant),
    ``enc_planar``, ``dec_inter`` (interleaved int8 champion), ``dec_nt4``
    (planar bf16-expansion decode).
    """
    if kernel == "enc_inter":
        m = _b5_enc_mat_inter()
        return 0, (B5_ROW_NT // B5_ENC_GRP_NT) * m.shape[0] * m.shape[1]
    if kernel == "enc_planar":
        m = _b5_enc_mat_v2()
        return 0, m.shape[0] * m.shape[1]
    if kernel == "dec_inter":
        g = _b5_dec_gather_fold_bf16()
        s = _b5_dec_scatter_quads_i8()
        return (
            B5_SLICES * s.shape[0] * s.shape[1],
            B5_SLICES * g.shape[0] * g.shape[1],
        )
    if kernel == "dec_nt4":
        pa, pb = _b5_dec_mats()[:2]
        s = _b5_dec_scatter_pairs_i8()
        return (
            B5_SLICES * s.shape[0] * s.shape[1],
            B5_SLICES * (pa.shape[0] * pa.shape[1] + pb.shape[0] * pb.shape[1]),
        )
    if kernel == "gc_inter":
        g = _b5_dec_gather_fold_bf16()
        return 0, B5_SLICES * g.shape[0] * g.shape[1]
    if kernel == "search_inter":
        # per SEARCH row (13824 nt = 512 words + 128 overlap words): five
        # 256-lane chunks x four (., 512) @ (512, 128) de-interleave dots
        we, _ = _b5_deint_mats_bf16()
        nchunks = (B5_SEARCH_WORDS + B5_SEARCH_OVW) // 128
        return 0, nchunks * 4 * we.shape[0] * we.shape[1]
    raise KeyError(kernel)


def b5_kernel_vpu_lane_ops(kernel: str) -> int:
    """Static elementwise u32 VPU lane-op count of one 3456-nt row.

    The interleaved decoder runs ~2x above max(HBM, MXU) time — the VPU
    issue stream is its binding resource.  The count is a hand audit of
    :func:`_decode_b5_inter_kernel` in the reference README's
    port-pressure style (reference README.md:383-402): one op = one
    elementwise ALU/convert/copy per lane; u32<->i32 reinterprets are
    free; MXU matmuls and stores are excluded.

    DIAGNOSTIC ONLY — not a roofline term.  The 2026-08 hardware
    calibration (tools/vpu_peak.py, 2.165 T dependent-chain ops/s)
    cross-checked against this audit showed the decoder executing its
    ~64k audited ops per row in 13.75 ns (~4.7 T audited-ops/s): converts,
    copies and fused shift+mask pairs issue beside the ALU slots the tool
    saturates, so audited-op counts and the measured rate are different
    units for mixed streams.  See utils.profiling.VPU_U32_GOPS for the
    scope rule (the rate IS a valid ceiling for the Myers rows'
    dependent add/xor/shift/and recurrences).
    """
    hoisted = 256 * (2 + 3 + 3 + 2)  # byte planes: ands/shifts + bf16 converts
    if kernel == "dec_inter":
        per_slice = (
            128 * 1            # 4x32-lane plane concat copies
            + 256 * 3          # t: f32->i32 convert, >>7, &0x7F
            + 256 * 2 * 2      # q5, q25 multiply-shift divisions
            + 256 * 2 * 2      # digits: t-5*q5, q5-5*q25 (mul+sub each)
            + 768 * 2          # digit concat copies + int8 converts
            + 128 * 6          # v5/v25/v125 multiply-shift splits
            + 128 * 6          # linear packed-digit assembly (3 mul + 3 add)
            + 112 * 15         # SWAR digits->chars (shifts/nots/ands/muls/adds)
        )
        return hoisted + B5_SLICES * per_slice
    if kernel == "gc_inter":
        per_slice = (
            128 * 1            # 4x32-lane plane concat copies
            + 256 * 3          # t: f32->i32 convert, >>7, &0x7F
            + 256 * 2 * 2      # u, v multiply-shift quotients
            + 256 * 8          # (t^u)&1 + (u^v)&1 + (v&1): 5 ALU, 2 add,
                               # 1 accumulate
        )
        # + the per-row lane reduction (log2(256) strided folds)
        return hoisted + B5_SLICES * per_slice + 256 * 8
    raise KeyError(kernel)
