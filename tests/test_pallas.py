"""Pallas kernel tier vs the NumPy oracle (interpret mode on CPU).

The real-TPU compilation of the same kernels is exercised by bench.py and
__graft_entry__.py; these tests pin the kernel *math* bit-exactly to the
oracle on randomized, mixed-case, all-length inputs (SURVEY.md §4 strategy).
"""

import functools

import numpy as np
import pytest

import jax.numpy as jnp

from cute_nucleotides_tpu.ops import oracle, pallas_kernels as pk, spec

ALPHABET = np.frombuffer(b"ACGTUacgtu", dtype=np.uint8)


def _rand_seq(rng, n, alphabet=ALPHABET):
    return rng.choice(alphabet, size=n)


@pytest.mark.parametrize("variant", ["mul", "shift", "interleave"])
def test_encode_2bit_nt4_matches_oracle(rng, variant):
    n = 4096 * 4  # (8, 512) panel
    s = _rand_seq(rng, n)
    w = jnp.asarray(s.view(np.uint32).reshape(8, 512))
    packed = np.asarray(pk.encode_2bit_nt4(w, variant, interpret=True))
    got = spec.u32_pairs_to_u64(
        np.ascontiguousarray(packed.reshape(-1)).view(np.uint32)
    )
    assert np.array_equal(got, oracle.n_to_bits_lut(s))


@pytest.mark.parametrize("variant", ["shuffle", "select", "swar"])
def test_decode_2bit_nt4_matches_oracle(rng, variant):
    n = 4096 * 4
    s = _rand_seq(rng, n)
    words = oracle.n_to_bits_lut(s)
    p = spec.u64_to_u32_pairs(words).reshape(-1).view(np.uint8)
    nt4 = np.asarray(
        pk.decode_2bit_nt4(jnp.asarray(p.reshape(8, 512)), variant, interpret=True)
    )
    got = np.ascontiguousarray(nt4.reshape(-1)).view(np.uint8)
    want = oracle.bits_to_n_lut(words, n)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("variant", ["mul", "shift", "interleave"])
def test_encode_2bit_words_batch(rng, variant):
    B, L = 4, 160
    batch = _rand_seq(rng, B * L).reshape(B, L)
    out = np.asarray(
        pk.encode_2bit_words(jnp.asarray(batch), variant, interpret=True)
    )
    for b in range(B):
        want = oracle.n_to_bits_lut(batch[b])
        assert np.array_equal(spec.u32_pairs_to_u64(out[b]), want)


def test_decode_2bit_bytes_roundtrip(rng):
    B, L = 4, 320
    batch = _rand_seq(rng, B * L).reshape(B, L)
    words = pk.encode_2bit_words(jnp.asarray(batch), interpret=True)
    back = np.asarray(pk.decode_2bit_bytes(words, interpret=True))
    want = np.frombuffer(
        bytes(batch.tobytes().upper()).replace(b"U", b"T"), dtype=np.uint8
    ).reshape(B, L)
    assert np.array_equal(back, want)


def test_ragged_rows_masked(rng):
    # R=3 rows with a cdiv grid: out-of-bounds rows must not corrupt output
    n = 3 * 512 * 4
    s = _rand_seq(rng, n)
    w = jnp.asarray(s.view(np.uint32).reshape(3, 512))
    packed = np.asarray(pk.encode_2bit_nt4(w, interpret=True))
    got = spec.u32_pairs_to_u64(
        np.ascontiguousarray(packed.reshape(-1)).view(np.uint32)
    )
    assert np.array_equal(got, oracle.n_to_bits_lut(s))


def test_encode_2bit_mxu_variant(rng):
    n = 8 * 2048 * 4
    s = _rand_seq(rng, n)
    w = jnp.asarray(s.view(np.uint32).reshape(8, 2048))
    words = np.asarray(pk.encode_2bit_nt4_mxu(w, interpret=True))
    got = spec.u32_pairs_to_u64(np.ascontiguousarray(words.reshape(-1)))
    assert np.array_equal(got, oracle.n_to_bits_lut(s))


def test_encode_2bit_words_mxu_adapter(rng):
    """The words-API form of the MXU pack: ragged C padded to 512 lanes."""
    for L in (64, 2048, 8192, 2048 * 3):
        s = rng.choice(
            np.frombuffer(b"ACGTUacgtu", np.uint8), size=(3, L)
        )
        got = np.asarray(
            pk.encode_2bit_words_mxu(jnp.asarray(s), interpret=True)
        )
        want = np.stack([oracle.n_to_bits_lut(row) for row in s])
        assert np.array_equal(
            spec.u32_pairs_to_u64(np.ascontiguousarray(got.reshape(-1))),
            want.reshape(-1),
        ), L


def test_encode_2bit_checked_valid_input(rng):
    n = 4096 * 4
    s = _rand_seq(rng, n)
    w = jnp.asarray(s.view(np.uint32).reshape(8, 512))
    packed, badplane = pk.encode_2bit_nt4_checked(w, "mul", interpret=True)
    ref = np.asarray(pk.encode_2bit_nt4(w, "mul", interpret=True))
    assert np.array_equal(np.asarray(packed), ref)
    assert not np.asarray(badplane).any()


@pytest.mark.parametrize("bad_byte", [ord("N"), ord("X"), 0, 0x80, 0xFF, ord("B")])
def test_encode_2bit_checked_flags_bad_rows(rng, bad_byte):
    n = 4096 * 4
    s = _rand_seq(rng, n).reshape(8, -1)
    s[3, 777] = bad_byte
    s[6, 0] = bad_byte
    w = jnp.asarray(np.ascontiguousarray(s).view(np.uint32))
    _, badplane = pk.encode_2bit_nt4_checked(w, "mul", interpret=True)
    flags = np.asarray(badplane).any(axis=-1)
    assert list(np.nonzero(flags)[0]) == [3, 6]


def test_encode_2bit_checked_all_bytes_exact(rng):
    # every byte value 0..255 in every of the 4 byte positions
    s = np.full((8, 512 * 4), ord("A"), np.uint8)
    vals = np.arange(256, dtype=np.uint8)
    valid = np.frombuffer(b"ACGTUacgtu", np.uint8)
    for pos in range(4):
        s[pos % 8, pos * 256 : (pos + 1) * 256] = vals
    w = jnp.asarray(np.ascontiguousarray(s).view(np.uint32))
    _, badplane = pk.encode_2bit_nt4_checked(w, "mul", interpret=True)
    bad_lanes = np.asarray(badplane)
    # recompute expected per-row flags with the plain python definition
    want = np.array([np.any(~np.isin(row, valid)) for row in s])
    assert np.array_equal(bad_lanes.any(axis=-1), want)


def test_encode_2bit_words_checked_flags(rng):
    s = _rand_seq(rng, 3 * 1024).reshape(3, 1024)
    s[1, 500] = ord("Z")
    words, bad = pk.encode_2bit_words_checked(jnp.asarray(s), "mul", interpret=True)
    ref = np.asarray(pk.encode_2bit_words(jnp.asarray(s), "mul", interpret=True))
    assert np.array_equal(np.asarray(words), ref)
    assert list(np.asarray(bad)) == [False, True, False]
