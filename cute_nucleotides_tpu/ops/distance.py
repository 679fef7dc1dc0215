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
  reads in a batch as ONE MXU matmul over one-hot planes —
  ``matches = A @ A^T`` with ``A[b, 4*pos + code] = 1`` — the TPU-native
  formulation (compute lives on the systolic array, exact in f32 for
  ``L < 2^24``), which no scalar/SIMD CPU sketch can match at batch scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["hamming_packed", "hamming_seqs", "pairwise_hamming"]


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


def _one_hot_planes(reads: jax.Array) -> jax.Array:
    """u8[B, L] -> bf16[B, 4L] one-hot over the 2-bit code per position."""
    codes = _fold2(reads).astype(jnp.int32)  # [B, L]
    oh = jax.nn.one_hot(codes, 4, dtype=jnp.bfloat16)  # [B, L, 4]
    return oh.reshape(reads.shape[0], reads.shape[1] * 4)


@jax.jit
def pairwise_hamming(reads: jax.Array) -> jax.Array:
    """All-pairs nt Hamming distances for a batch: u8[B, L] -> i32[B, B].

    One MXU matmul: matching positions are the dot product of one-hot code
    planes; distance = L - matches.  Exact (f32 accumulation of 0/1
    products) for ``L < 2**24``.
    """
    L = reads.shape[1]
    a = _one_hot_planes(reads)
    matches = jnp.dot(a, a.T, preferred_element_type=jnp.float32)
    return (L - matches).astype(jnp.int32)
