"""K-mer extraction and counting on the 2-bit packed domain.

The point of a 2-bit codec in production is what you can do *without
decoding*; k-mers are the canonical example.  A k-mer starting at nucleotide
``i`` is simply bits ``[2i, 2i + 2k)`` of the packed stream, so extraction is
a funnel shift over adjacent u32 words and counting is one device
scatter-add — no ASCII round-trip, ~1/4 the memory traffic of a byte-domain
k-mer scan.

Supports k <= 15 (codes fit int32 with headroom).  Canonical form (the
lexicographic minimum of a k-mer and its reverse complement, the standard
de-duplication in assembly/counting pipelines) uses the same SWAR
field-reversal tricks as :mod:`.seqops`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import spec

__all__ = ["kmer_codes", "revcomp_code", "canonical_codes", "kmer_histogram"]


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


@functools.partial(jax.jit, static_argnames=("length", "k", "canonical"))
def kmer_histogram(
    words: jax.Array, length: int, k: int, *, canonical: bool = False
) -> jax.Array:
    """Count every k-mer of a packed stream: -> i32[4**k] (device scatter-add).

    ``canonical=True`` folds each k-mer with its reverse complement first.
    Memory is 4 * 4**k bytes (k=12 -> 64 MiB), so keep k modest on-device.
    """
    codes = kmer_codes(words, length, k)
    if canonical:
        codes = canonical_codes(codes, k)
    return jnp.zeros(4**k, jnp.int32).at[codes].add(1)
