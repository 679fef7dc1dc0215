"""Packed-domain sequence ops: reverse complement, GC content."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cute_nucleotides_tpu.ops import oracle, seqops, spec, xla

COMP = bytes.maketrans(b"ACGT", b"TGCA")


def _revcomp(seq: bytes) -> bytes:
    return seq.upper().replace(b"U", b"T").translate(COMP)[::-1]


@pytest.mark.parametrize("n", [1, 15, 16, 17, 31, 32, 33, 1000])
def test_revcomp_packed(rng, n):
    s = rng.choice(np.frombuffer(b"ACGTUacgtu", np.uint8), size=n)
    w64 = oracle.n_to_bits_lut(s)
    w32 = jnp.asarray(spec.u64_to_u32_pairs(w64).reshape(-1))
    got = np.asarray(seqops.revcomp_packed(w32, n))
    want64 = oracle.n_to_bits_lut(np.frombuffer(_revcomp(bytes(s)), np.uint8))
    want = spec.u64_to_u32_pairs(want64).reshape(-1)
    assert np.array_equal(got, want), (n, got, want)


def test_complement_packed_roundtrip(rng):
    s = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=64)
    w = jnp.asarray(spec.u64_to_u32_pairs(oracle.n_to_bits_lut(s)).reshape(-1))
    twice = seqops.complement_packed(seqops.complement_packed(w))
    assert np.array_equal(np.asarray(twice), np.asarray(w))


@pytest.mark.parametrize("n", [5, 32, 1000])
def test_gc_content(rng, n):
    s = rng.choice(np.frombuffer(b"ACGTUacgtu", np.uint8), size=n)
    want = sum(1 for c in bytes(s).upper() if c in b"CG")
    w = jnp.asarray(spec.u64_to_u32_pairs(oracle.n_to_bits_lut(s)).reshape(-1))
    assert int(seqops.gc_content_packed(w)) == want
    assert int(seqops.gc_content_bytes(jnp.asarray(s))) == want


def test_gc_content_batched(rng):
    batch = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(4, 64))
    words = jax.jit(xla.encode_2bit_words)(jnp.asarray(batch))
    got = np.asarray(seqops.gc_content_packed(words))
    want = [(row == ord("C")).sum() + (row == ord("G")).sum() for row in batch]
    assert got.tolist() == want
