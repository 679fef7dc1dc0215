"""Packed-domain sequence operations: reverse complement and GC content.

These demonstrate the point of the 2-bit format (and of keeping data resident
on device): common genomics primitives become a handful of fused elementwise
ops on the packed stream — no decode pass needed.

* **Complement** is ``code XOR 0b10`` (A<->T is 00<->10, C<->G is 01<->11 —
  the 2-bit code inherits this involution from ASCII bits 1-2), i.e. one
  XOR with ``0xAAAAAAAA`` per packed u32.
* **Reverse** is lane reversal + byteswap + 2-bit-field reversal per byte
  (SWAR), plus a cross-lane funnel shift when the length is not a multiple
  of the word size.
* **GC content**: C (01) and G (11) are exactly the codes with bit 0 set, so
  the count is ``popcount(word & 0x5555...)`` — 'A' padding contributes 0,
  making ragged tails free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import spec

__all__ = [
    "complement_packed",
    "revcomp_packed",
    "gc_content_packed",
    "gc_content_bytes",
]


def complement_packed(words: jax.Array) -> jax.Array:
    """Complement every nucleotide of a 2-bit packed u32 stream in place.

    Note: also flips 'A' padding in the tail word to 'T'; pair with a length
    mask (or use :func:`revcomp_packed`, which re-zeroes the tail).
    """
    return words ^ jnp.uint32(0xAAAAAAAA)


def _reverse_within_u32(w: jax.Array) -> jax.Array:
    """Reverse the 16 2-bit fields inside each u32 lane (SWAR)."""
    # byteswap
    w = (
        ((w & jnp.uint32(0xFF)) << 24)
        | ((w & jnp.uint32(0xFF00)) << 8)
        | ((w >> 8) & jnp.uint32(0xFF00))
        | (w >> 24)
    )
    # reverse 2-bit fields within each byte
    return (
        ((w & jnp.uint32(0x03030303)) << 6)
        | ((w & jnp.uint32(0x0C0C0C0C)) << 2)
        | ((w >> 2) & jnp.uint32(0x0C0C0C0C))
        | ((w >> 6) & jnp.uint32(0x03030303))
    )


@functools.partial(jax.jit, static_argnames=("length",))
def revcomp_packed(words: jax.Array, length: int) -> jax.Array:
    """Reverse-complement a 2-bit packed u32[W] stream of ``length`` nt.

    Returns the packed stream of the reverse complement with the same word
    count and zeroed (i.e. 'A'-coded) tail bits, bit-exact to encoding the
    reverse complement of the decoded sequence.
    """
    if words.ndim != 1:
        raise TypeError("revcomp_packed takes a flat u32 word stream")
    W = words.shape[0]
    if length > W * spec.NT_PER_U32_2BIT:
        raise ValueError(f"length {length} exceeds capacity {W * 16}")
    # The reversed stream starts at bit offset 2*(16W - length); shifting
    # the REVERSED stream down by b bits reads neighbor pairs (i, i+1),
    # which is the pair (j, j-1) of the UNREVERSED stream — so run the
    # funnel first and reverse last.  Two structural choices keep this at
    # TWO memory passes (measured 1.118 -> 0.404 ms on 268 Mnt, 2.8x; the
    # naive form was 4 passes, and 0.404 ms is exactly 2x the stream size
    # at HBM bandwidth — the 2-pass speed of light):
    # * the funnel taps apply the SWAR complement/bit-reversal to both raw
    #   input reads instead of materializing the SWAR'd array (XLA fuses
    #   multi-tap reads of a parameter; a two-tap read of a produced value
    #   forces a materialization pass),
    # * the tail mask always equals the funnel's bit remainder
    #   (2*(16W-len) == -2*len mod 32), so it reduces to masking word 0
    #   BEFORE the reverse (and to nothing when whole lanes shift out).
    lane_sh, bit_sh = divmod(2 * (W * spec.NT_PER_U32_2BIT - length), 32)

    def g(v):
        return _reverse_within_u32(complement_packed(v))

    if bit_sh:
        # the virtual word before the stream must contribute zero bits AFTER
        # g(); g(v) == 0 iff v == 0xAAAAAAAA (all-'T' codes), so pad with that
        prev = jnp.concatenate(
            [jnp.full(1, 0xAAAAAAAA, jnp.uint32), words[:-1]]
        )
        u = (g(words) >> bit_sh) | (g(prev) << (32 - bit_sh))
        if lane_sh == 0:
            # zero the tail beyond `length` (complement turned 'A' pads
            # into 'T'); post-reverse this is the LAST word
            u = u.at[0].set(u[0] & (jnp.uint32(0xFFFFFFFF) >> bit_sh))
    else:
        u = g(words)
    rev = u[::-1]
    if lane_sh:
        rev = jnp.concatenate([rev[lane_sh:], jnp.zeros(lane_sh, jnp.uint32)])
    return rev


def gc_content_packed(words: jax.Array) -> jax.Array:
    """Count of C+G nucleotides per stream: u32[..., W] -> i32[...].

    Codes C (01) and G (11) are exactly those with bit 0 set; 'A' padding
    counts 0, so ragged tails need no masking.
    """
    return jnp.sum(
        jax.lax.population_count(words & jnp.uint32(0x55555555)).astype(
            jnp.int32
        ),
        axis=-1,
    )


def gc_content_bytes(reads: jax.Array) -> jax.Array:
    """Count of C+G per read from ASCII bytes (case-insensitive)."""
    code = (reads >> 1) & jnp.uint8(3)
    # C=01, G=11 have bit0 set; but T/U (10) and A (00) do not
    return jnp.sum((code & 1).astype(jnp.int32), axis=-1)
