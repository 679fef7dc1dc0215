"""Nucleotide Hamming distances — the reference's unimplemented idea, built.

The reference's conclusion (reference README.md:412-418) sketches a 3-bit
pairwise-equidistant encoding ``{A,T,C,G} -> {110,011,000,101}`` so nucleotide
Hamming distance is ``popcount(xor) >> 1`` — but never implements it.  On TPU
we do better than the sketch in both density and speed:

* **Packed domain** (:func:`hamming_packed`): on the existing 2-bit packed
  words, ``d = a ^ b; popcount((d | d >> 1) & 0x5555...)`` counts differing
  nucleotides in 4 VPU ops at 2 bits/nt — denser than the 3-bit equidistant
  code and the same op count, with no re-encoding pass.
* **Byte domain** (:func:`hamming_seqs`): case- and T/U-insensitive compare
  via the ASCII 2-bit property (``(b >> 1) & 3``).
* **All-pairs** (:func:`pairwise_hamming`): distances between every pair of
  reads in a batch as MXU matmuls over one-hot planes —
  ``matches = A @ A^T`` with ``A[b, 4*pos + code] = 1`` — the TPU-native
  formulation (compute lives on the systolic array), which no scalar/SIMD
  CPU sketch can match at batch scale.  The one-hot planes are int8 and the
  accumulation int32 (exact for ``L < 2^31``), built chunk-by-chunk over the
  length axis so peak memory is ``B * 4*chunk`` int8 regardless of L —
  usable at B >= 4096, L in the tens of thousands.
  :func:`pairwise_hamming_packed` does the same straight from 2-bit packed
  words (0.25 bytes/nt read, no decode pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "hamming_packed",
    "hamming_seqs",
    "pairwise_hamming",
    "pairwise_hamming_packed",
]


def _fold2(x: jax.Array) -> jax.Array:
    """ASCII byte -> 2-bit code (case- and T/U-insensitive)."""
    return (x >> 1) & jnp.uint8(3)


def hamming_packed(a: jax.Array, b: jax.Array) -> jax.Array:
    """Differing-nt count between two equal-shape 2-bit packed u32 streams.

    Trailing padding must match (e.g. both 'A'-padded); reduces over the last
    axis, so ``u32[..., W] -> i32[...]``.
    """
    d = a ^ b
    pairs = (d | (d >> 1)) & jnp.uint32(0x55555555)
    return jnp.sum(
        jax.lax.population_count(pairs).astype(jnp.int32), axis=-1
    )


def hamming_seqs(a: jax.Array, b: jax.Array) -> jax.Array:
    """Differing-nt count between two equal-shape ASCII u8 sequences."""
    return jnp.sum((_fold2(a) != _fold2(b)).astype(jnp.int32), axis=-1)


def _pairwise_from_codes(codes: jax.Array, chunk: int) -> jax.Array:
    """i32 codes [B, L] (values 0..3) -> all-pairs match counts i32[B, B].

    Chunked over L: each chunk builds a ``(B, 4*chunk)`` int8 one-hot and
    accumulates ``A @ A^T`` in int32 on the MXU — exact 0/1 sums, bounded
    VMEM/HBM footprint, no f32 rounding ceiling.
    """
    B, L = codes.shape
    pad = (-L) % chunk
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((B, pad), codes.dtype)], axis=1
        )
    nchunks = codes.shape[1] // chunk

    def body(i, acc):
        c = jax.lax.dynamic_slice_in_dim(codes, i * chunk, chunk, axis=1)
        oh = jax.nn.one_hot(c, 4, dtype=jnp.int8).reshape(B, 4 * chunk)
        return acc + jax.lax.dot_general(
            oh, oh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )

    acc0 = jnp.zeros((B, B), jnp.int32)
    matches = jax.lax.fori_loop(0, nchunks, body, acc0)
    # pad positions match in every pair: matches_pad = matches + pad, and
    # d = L - matches = (L + pad) - matches_pad, so subtract on padded L
    return matches - pad


@functools.partial(jax.jit, static_argnames=("chunk",))
def pairwise_hamming(reads: jax.Array, *, chunk: int = 2048) -> jax.Array:
    """All-pairs nt Hamming distances for a batch: u8[B, L] -> i32[B, B].

    Matching positions are the dot product of int8 one-hot code planes,
    accumulated chunk-by-chunk on the MXU; distance = L - matches.  Exact
    (i32 accumulation of 0/1 products) for ``L < 2**31``.
    """
    L = reads.shape[1]
    codes = _fold2(reads).astype(jnp.int32)
    return L - _pairwise_from_codes(codes, chunk)


@functools.partial(jax.jit, static_argnames=("chunk",))
def pairwise_hamming_packed(
    words: jax.Array, *, chunk: int = 2048
) -> jax.Array:
    """All-pairs distances straight from packed words: u32[B, W] -> i32[B, B].

    Reads 0.25 bytes/nt (no decode pass); trailing padding must match
    across reads (e.g. all 'A'-padded), as for :func:`hamming_packed`.
    Distances count all ``16 * W`` positions including any shared padding
    (equal padding contributes zero distance).
    """
    B, W = words.shape
    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    codes = ((words[:, :, None] >> shifts[None, None, :]) & 3).astype(jnp.int32)
    return 16 * W - _pairwise_from_codes(codes.reshape(B, 16 * W), chunk)
