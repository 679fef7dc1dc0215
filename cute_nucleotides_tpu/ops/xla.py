"""XLA whole-array tier: jit-compiled codec kernels built from lane-local ops.

Design (TPU-first, not a port of the reference's AVX2 code):

The TPU VPU is an (8, 128) lattice of 32-bit lanes with no pext/pdep/movemask
and no cheap cross-lane shuffles.  Instead of translating the reference's
byte-shuffle tricks, every kernel here is built around one observation: after
``lax.bitcast_convert_type(u8[..., 4] -> u32)`` (little-endian, verified
on-device), each u32 lane holds **4 consecutive nucleotides**, and both codecs
become *fully lane-local* integer arithmetic:

* 2-bit encode: 4 nt/lane crunch to one packed byte per lane via either a
  log-depth shift-OR tree (analogue of reference src/n_to_bits.rs:121-166
  ``n_to_bits_shift``) or a single multiply-as-bit-shuffle (analogue of
  reference src/n_to_bits.rs:213-259 ``n_to_bits_mul``); 4 packed bytes
  bitcast back to one output u32 (16 nt).
* 2-bit decode: the inverse — bitcast each packed byte into a lane, expand to
  4 ASCII chars with a *variable per-lane shift* into a 4-entry LUT packed in
  a u32 constant (analogue of the shuffle-LUT in reference
  src/n_to_bits.rs:265-303 ``bits_to_n_shuffle``), bitcast out.
* base-5: digit extraction via the packed ``char & 7`` nibble LUT (same ASCII
  property as reference src/n_to_bits2.rs:127-136), triplet ``a + 5b + 25c``
  as an elementwise mul-add (the maddubs analogue, reference
  src/n_to_bits2.rs:160-165), 7-bit packing into u32 pairs via static
  shift-ORs, and decode div/mod-by-5/25 as multiply-shift constant division
  (the Lemire trick of reference src/n_to_bits2.rs:241-247, exact for the
  7-bit triplet domain).

Everything is elementwise / static-strided, so XLA fuses each codec into a
single memory-bound pass.  These same formulas are reused inside the Pallas
kernels (:mod:`cute_nucleotides_tpu.ops.pallas_kernels`) on explicit VMEM
tiles.

Shape contracts (enforced, callers pad via :mod:`cute_nucleotides_tpu.api`):

* ``encode_2bit_words``:  u8[..., L] -> u32[..., L//16],  L % 16 == 0
* ``decode_2bit_bytes``:  u32[..., W] -> u8[..., W*16]
* ``encode_b5_words``:    u8[..., L] -> u32[..., 2*(L//27)],  L % 27 == 0
* ``decode_b5_bytes``:    u32[..., 2*W] -> u8[..., W*27]

Padding nucleotide is ``A`` (code 0 / digit 0), which makes zero-padding
reproduce the reference's tail semantics exactly (unused high bits zero,
missing triplet digits zero).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import spec

# magic multiplier gathering the four 2-bit codes of a u32 lane into its top
# byte: with t = w & 0x06060606 (code*2 in each byte), bits 24..31 of
# t * MUL_MAGIC are c0 | c1<<2 | c2<<4 | c3<<6 (no cross-term collisions).
MUL_MAGIC = (1 << 5) | (1 << 11) | (1 << 17) | (1 << 23)

#: multiply-shift constants for exact /5 and /25 on the 7-bit triplet domain
DIV5_MUL, DIV5_SHIFT = 205, 10    # t//5  == (t*205) >> 10  for t < 1024
DIV25_MUL, DIV25_SHIFT = 41, 10   # t//25 == (t*41)  >> 10  for t < 1024

ENCODE_2BIT_VARIANTS = ("shift", "mul", "interleave", "dot")
DECODE_2BIT_VARIANTS = ("shuffle", "select", "swar", "broadcast")


def _bytes_to_u32(x: jax.Array) -> jax.Array:
    """u8[..., 4k] -> u32[..., k], little-endian (4 consecutive bytes/lane)."""
    assert x.dtype == jnp.uint8 and x.shape[-1] % 4 == 0
    return jax.lax.bitcast_convert_type(
        x.reshape(*x.shape[:-1], x.shape[-1] // 4, 4), jnp.uint32
    )


def _u32_to_bytes(w: jax.Array) -> jax.Array:
    """u32[..., k] -> u8[..., 4k], little-endian."""
    assert w.dtype == jnp.uint32
    b = jax.lax.bitcast_convert_type(w, jnp.uint8)
    return b.reshape(*w.shape[:-1], w.shape[-1] * 4)


# --- 2-bit codec -----------------------------------------------------------

def pack4_shift(w: jax.Array) -> jax.Array:
    """u32 lane of 4 ASCII nt -> packed byte (low 8 bits), shift-OR tree."""
    t = (w >> 1) & jnp.uint32(0x03030303)
    u = t | (t >> 6)
    return (u | (u >> 12)) & jnp.uint32(0xFF)


def pack4_mul(w: jax.Array) -> jax.Array:
    """u32 lane of 4 ASCII nt -> packed byte, multiply-as-bit-shuffle."""
    t = w & jnp.uint32(0x06060606)
    return (t * jnp.uint32(MUL_MAGIC)) >> 24


def pack4_interleave(w: jax.Array) -> jax.Array:
    """u32 lane of 4 ASCII nt -> packed byte, even/odd interleave (the
    movemask analogue; see pallas_kernels._pack4_interleave)."""
    e = (w >> 1) & jnp.uint32(0x00030003)
    o = (w >> 9) & jnp.uint32(0x00030003)
    m = e | (o << 2)
    return (m | (m >> 12)) & jnp.uint32(0xFF)


def _encode_2bit_dot(x: jax.Array) -> jax.Array:
    """Bitcast-free encode: widen codes, pack 16 per word via two small f32
    dots with power-of-4 weights (the ``maddubs``-as-dot-product idea of
    reference src/n_to_bits2.rs:160-165 applied to the 2-bit codec).

    The SWAR variants need the byte stream re-tiled as u32 lanes; on TPU
    that device bitcast costs a relayout copy worth ~60% of the op (see
    docs/DESIGN.md §7 on layout taxes).  This formulation never changes
    dtype tiling: codes are exact in f32, each 8-code dot is < 2^16, and
    the two halves recombine with one shift-OR.  Measured 22 -> 82 GiB/s
    on TPU; also the fastest CPU form.
    """
    c = ((x >> 1) & jnp.uint8(3)).astype(jnp.float32)
    g = c.reshape(*c.shape[:-1], c.shape[-1] // 16, 16)
    w = jnp.asarray((1 << (2 * np.arange(8))).astype(np.float32))
    lo = jnp.dot(g[..., :8], w).astype(jnp.uint32)
    hi = jnp.dot(g[..., 8:], w).astype(jnp.uint32)
    return lo | (hi << 16)


def encode_2bit_words(x: jax.Array, variant: str = "mul") -> jax.Array:
    """Encode u8[..., L] (L % 16 == 0) to packed u32[..., L // 16].

    Each output u32 holds 16 nt LSB-first; viewing the little-endian output
    stream as u64 reproduces the reference's word layout exactly.
    """
    if x.shape[-1] % spec.NT_PER_U32_2BIT:
        raise ValueError(f"last dim {x.shape[-1]} not a multiple of 16")
    if variant == "dot":
        return _encode_2bit_dot(x)
    w = _bytes_to_u32(x)
    packed = {
        "shift": pack4_shift, "mul": pack4_mul, "interleave": pack4_interleave
    }[variant](w)
    return _bytes_to_u32(packed.astype(jnp.uint8))


def _codes_to_chars_shuffle(c: jax.Array) -> jax.Array:
    """2-bit codes -> ASCII via variable shift into a packed u32 LUT."""
    return (jnp.uint32(spec.BITS_TO_CHAR_2BIT_U32) >> (c << 3)) & jnp.uint32(0xFF)


def _codes_to_chars_select(c: jax.Array) -> jax.Array:
    """2-bit codes -> ASCII via an arithmetic select tree (no shifts)."""
    ch = jnp.uint32(ord("A"))
    ch = ch + jnp.where(c == 1, jnp.uint32(2), jnp.uint32(0))
    ch = ch + jnp.where(c == 2, jnp.uint32(19), jnp.uint32(0))
    ch = ch + jnp.where(c == 3, jnp.uint32(6), jnp.uint32(0))
    return ch


def _codes_to_chars_swar(b: jax.Array) -> jax.Array:
    """All 4 chars at once via byte-parallel SWAR (see pallas_kernels)."""
    m1 = (b & jnp.uint32(0x33)) * jnp.uint32((1 << 0) | (1 << 12))
    m2 = (b & jnp.uint32(0xCC)) * jnp.uint32((1 << 6) | (1 << 18))
    s = (m1 | m2) & jnp.uint32(0x03030303)
    e = (s >> 1) & (~s) & jnp.uint32(0x01010101)
    return jnp.uint32(0x41414141) + (s << 1) + e * jnp.uint32(15)


def decode_2bit_bytes(words: jax.Array, variant: str = "swar") -> jax.Array:
    """Decode packed u32[..., W] to ASCII u8[..., W*16] (full blocks).

    Callers truncate to the logical nucleotide count (the packed stream does
    not self-terminate; contract of reference src/n_to_bits.rs:51,150-151).
    """
    if variant == "broadcast":
        # bitcast-free: broadcast each word against the 16 field shifts and
        # narrow to u8 — avoids the u32->u8 device relayout the SWAR forms
        # pay (2x on TPU, also fastest on CPU)
        sh = 2 * jnp.arange(16, dtype=jnp.uint32)
        c = (words[..., None] >> sh) & jnp.uint32(3)
        ch = (jnp.uint32(spec.BITS_TO_CHAR_2BIT_U32) >> (c << 3)) & jnp.uint32(0xFF)
        return ch.astype(jnp.uint8).reshape(
            *words.shape[:-1], words.shape[-1] * 16
        )
    b = _u32_to_bytes(words).astype(jnp.uint32)  # one packed byte (4 nt)/lane
    if variant == "swar":
        return _u32_to_bytes(_codes_to_chars_swar(b))
    to_chars = {
        "shuffle": _codes_to_chars_shuffle,
        "select": _codes_to_chars_select,
    }[variant]
    ch0 = to_chars(b & 3)
    ch1 = to_chars((b >> 2) & 3)
    ch2 = to_chars((b >> 4) & 3)
    ch3 = to_chars((b >> 6) & 3)
    out = ch0 | (ch1 << 8) | (ch2 << 16) | (ch3 << 24)
    return _u32_to_bytes(out)


# --- base-5 codec ----------------------------------------------------------

def _digits_b5(x: jax.Array) -> jax.Array:
    """ASCII u8[...] -> base-5 digit u32[...] via the packed nibble LUT."""
    idx = (x & jnp.uint8(7)).astype(jnp.uint32)
    return (jnp.uint32(spec.DIGIT_LUT8_U32) >> (idx << 2)) & jnp.uint32(0xF)


@functools.lru_cache(maxsize=1)
def _b5_dot_weights() -> np.ndarray:
    """(27, 7) f32 weights mapping a word's 27 digits to pack columns.

    Digit ``i = 3 j + r`` of a word contributes ``5^r`` to triplet ``j``
    (reference src/n_to_bits2.rs:49-53); triplets group into columns
    [p0a = t0 + 128 t1, t2, p1 = t3 + 128 t4, qa = t5 + 128 t6, t7, t4,
    t8] — every column <= 124 * 129 < 2^14, so the f32 dot is exact with
    huge margin (products <= 4 * 25 * 128 and sums < 2^14 << 2^24).
    """
    w = np.zeros((27, 7), np.float32)
    for i in range(27):
        j, r = divmod(i, 3)
        c = 5.0 ** r
        if j < 2:
            w[i, 0] = c * 128.0 ** j
        elif j == 2:
            w[i, 1] = c
        elif j < 5:
            w[i, 2] = c * 128.0 ** (j - 3)
        elif j < 7:
            w[i, 3] = c * 128.0 ** (j - 5)
        elif j == 7:
            w[i, 4] = c
        else:
            w[i, 6] = c
        if j == 4:
            w[i, 5] = c
    return w


def encode_b5_words(x: jax.Array) -> jax.Array:
    """Encode u8[..., L] (L % 27 == 0) to packed u32[..., 2 * (L // 27)].

    Output u32 pairs are the little-endian halves of the reference's 63-bit
    u64 words (9 triplets x 7 bits, LSB-first).

    Bitcast-free dot formulation (the `_encode_2bit_dot` idea at base-5
    radix): one (27 -> 7)-column f32 dot computes every triplet partial
    sum on the MXU — digits stay in their natural tiling, no
    tiny-minor-axis triplet reshape, and the seven u32 columns recombine
    with shift-ORs (triplet 4 straddles the 32-bit boundary: its low 4
    bits ride ``p1 << 21``'s truncation, its high 3 bits come from the
    dedicated t4 column).  Measured on TPU vs the elementwise triplet
    form: 35.4 -> 96.7 GiB/s on (rows, 3456) panels, 0.9 -> 8.9 GiB/s on
    flat 1-D streams (there the u8 1-D->2-D retiling dominates either
    way; big flat streams belong on the Pallas tier).
    """
    L = x.shape[-1]
    if L % spec.NT_PER_WORD_B5:
        raise ValueError(f"last dim {L} not a multiple of 27")
    W = L // spec.NT_PER_WORD_B5
    d = _digits_b5(x).astype(jnp.float32)
    g = d.reshape(*x.shape[:-1], W, 27)
    p = jnp.dot(g, jnp.asarray(_b5_dot_weights())).astype(jnp.uint32)
    p0a, t2, p1, qa, t7, t4, t8 = (p[..., i] for i in range(7))
    lo = p0a | (t2 << 14) | (p1 << 21)
    hi = (t4 >> 4) | (qa << 3) | (t7 << 17) | (t8 << 24)
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*x.shape[:-1], 2 * W)


def decode_b5_bytes(words: jax.Array) -> jax.Array:
    """Decode packed u32[..., 2*W] to ASCII u8[..., W*27] (full blocks)."""
    if words.shape[-1] % 2:
        raise ValueError("base-5 packed stream must have even u32 count")
    W = words.shape[-1] // 2
    pair = words.reshape(*words.shape[:-1], W, 2)
    lo, hi = pair[..., 0], pair[..., 1]
    m7 = jnp.uint32(0x7F)
    t = jnp.stack(
        [
            lo & m7,
            (lo >> 7) & m7,
            (lo >> 14) & m7,
            (lo >> 21) & m7,
            ((lo >> 28) | (hi << 4)) & m7,
            (hi >> 3) & m7,
            (hi >> 10) & m7,
            (hi >> 17) & m7,
            (hi >> 24) & m7,
        ],
        axis=-1,
    )  # (..., W, 9) triplet values in [0, 125)
    # exact multiply-shift division (Lemire analogue; reference
    # src/n_to_bits2.rs:241-247) — no integer divide on the VPU hot path
    q5 = (t * jnp.uint32(DIV5_MUL)) >> DIV5_SHIFT
    q25 = (t * jnp.uint32(DIV25_MUL)) >> DIV25_SHIFT
    d = jnp.stack([t - 5 * q5, q5 - 5 * q25, q25], axis=-1)  # (..., W, 9, 3)
    # digit -> ASCII: 4-entry packed LUT for {A,C,T,G}, select for N
    # (min with 3 keeps the discarded branch's shift amount < 32)
    ch = jnp.where(
        d == 4,
        jnp.uint32(ord("N")),
        (jnp.uint32(spec.BITS_TO_CHAR_2BIT_U32) >> (jnp.minimum(d, 3) << 3))
        & jnp.uint32(0xFF),
    )
    return ch.reshape(*words.shape[:-1], W * spec.NT_PER_WORD_B5).astype(jnp.uint8)
