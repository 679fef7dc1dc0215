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

#: default lane width (u32 lanes) for flat-stream panels: 512 lanes = 2 KiB
#: per row = 2048 nt
PANEL_LANES = 512

#: VMEM budget per buffered copy of (input tile + output tile); Mosaic
#: double-buffers both across grid steps, and the core has ~16 MiB of VMEM,
#: so keep one copy well under half of that.
VMEM_BUDGET = 3 * 1024 * 1024


def _row_block(lanes: int, bytes_per_lane: int, rows: int) -> int:
    """Pick a row-block size: multiple of 8, within VMEM budget.

    ``bytes_per_lane`` counts input + output bytes per lane-column.
    """
    max_rows = max(VMEM_BUDGET // max(lanes * bytes_per_lane, 1), 8)
    rb = 1 << (max_rows.bit_length() - 1)
    rb = min(rb, 1024)
    rb = max(rb, 8)
    return min(rb, max(8, rows))


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


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


_PACK4 = {"mul": _pack4_mul, "shift": _pack4_shift}


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
    R, C = x.shape
    rb = _row_block(C, 4 + 1, R)
    return pl.pallas_call(
        _encode_2bit_kernel(variant),
        grid=(_cdiv(R, rb),),
        in_specs=[pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint8),
        interpret=interpret,
    )(x)


def decode_2bit_nt4(p: jax.Array, variant: str = "shuffle", *, interpret: bool = False) -> jax.Array:
    """Decode packed u8[R, C] -> nt4 u32[R, C] (identity lane map)."""
    if p.dtype != jnp.uint8 or p.ndim != 2:
        raise TypeError(f"expected u8[R, C] packed input, got {p.dtype}{p.shape}")
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


def decode_2bit_bytes(words: jax.Array, variant: str = "shuffle", *, interpret: bool = False) -> jax.Array:
    """Drop-in Pallas analogue of :func:`..ops.xla.decode_2bit_bytes`:
    u32[..., W] -> u8[..., 16*W]."""
    W = words.shape[-1]
    lead = words.shape[:-1]
    p = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1, W * 4)
    nt4 = decode_2bit_nt4(p, variant, interpret=interpret)  # u32[R, 4W]
    return jax.lax.bitcast_convert_type(nt4, jnp.uint8).reshape(*lead, 16 * W)


@functools.lru_cache(maxsize=None)
def jit_encode_2bit(variant: str = "mul"):
    return jax.jit(functools.partial(encode_2bit_words, variant=variant))


@functools.lru_cache(maxsize=None)
def jit_decode_2bit(variant: str = "shuffle"):
    return jax.jit(functools.partial(decode_2bit_bytes, variant=variant))


def encode_2bit(variant: str = "mul"):
    """Traceable encode fn (for shard_map composition)."""
    return functools.partial(encode_2bit_words, variant=variant)


def decode_2bit(variant: str = "shuffle"):
    return functools.partial(decode_2bit_bytes, variant=variant)


# ---------------------------------------------------------------------------
# Base-5 codec (Pallas tier)
# ---------------------------------------------------------------------------
# The 27-byte/63-bit stride has no identity lane map.  The Pallas design (MXU
# as bit-scatter engine) is staged for a follow-up milestone; until it lands,
# the "pallas" tier for base-5 delegates to the fused XLA whole-array kernels,
# which are bit-exact and already single-pass-fused by XLA.

def encode_b5():
    return xla.encode_b5_words


def decode_b5():
    return xla.decode_b5_bytes


@functools.lru_cache(maxsize=None)
def jit_encode_b5():
    return jax.jit(xla.encode_b5_words)


@functools.lru_cache(maxsize=None)
def jit_decode_b5():
    return jax.jit(xla.decode_b5_bytes)
