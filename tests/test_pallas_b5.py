"""Base-5 Pallas kernels (MXU bit-scatter) vs the NumPy oracle, interpret mode.

The kernels compute every 16-bit half of an output word as an exact
bf16-input/f32-accumulate linear combination of lane-local triplet pieces
(see ops/pallas_kernels.py); these tests pin that construction bit-exactly to
the oracle (reference layout src/n_to_bits2.rs:44-53) across panel-boundary,
mixed-case, full-alphabet, and arbitrary-byte inputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cute_nucleotides_tpu.ops import oracle, pallas_kernels as pk, spec

ALPHABET = np.frombuffer(b"ACGTUNacgtun", dtype=np.uint8)


@pytest.mark.parametrize(
    "n", [27, 108, 3456, 3456 + 27, 2 * 3456 + 27 * 11]
)
def test_encode_b5_matches_oracle(rng, n):
    s = rng.choice(ALPHABET, size=n)
    got = np.asarray(pk.encode_b5_words_pallas(jnp.asarray(s), interpret=True))
    assert np.array_equal(spec.u32_pairs_to_u64(got), oracle.n_to_bits2_lut(s))


def test_encode_b5_batch(rng):
    b = rng.choice(ALPHABET, size=(5, 135))
    got = np.asarray(pk.encode_b5_words_pallas(jnp.asarray(b), interpret=True))
    for i in range(5):
        assert np.array_equal(
            spec.u32_pairs_to_u64(got[i]), oracle.n_to_bits2_lut(b[i])
        )


def test_encode_b5_arbitrary_bytes(rng):
    # defined out-of-alphabet behavior: all tiers agree (spec.py contract)
    s = rng.integers(0, 256, size=27 * 40, dtype=np.int64).astype(np.uint8)
    got = np.asarray(pk.encode_b5_words_pallas(jnp.asarray(s), interpret=True))
    assert np.array_equal(spec.u32_pairs_to_u64(got), oracle.n_to_bits2_lut(s))


@pytest.mark.parametrize("n", [27, 3456, 3456 + 27 * 9])
def test_decode_b5_matches_oracle(rng, n):
    s = rng.choice(ALPHABET, size=n)
    words = oracle.n_to_bits2_lut(s)
    w32 = jnp.asarray(spec.u64_to_u32_pairs(words).reshape(-1))
    got = np.asarray(pk.decode_b5_bytes_pallas(w32, interpret=True))
    assert np.array_equal(got[:n], oracle.bits_to_n2_lut(words, n))


def test_b5_roundtrip_batch(rng):
    b = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=(4, 216))
    w = pk.encode_b5_words_pallas(jnp.asarray(b), interpret=True)
    back = np.asarray(pk.decode_b5_bytes_pallas(w, interpret=True))
    assert np.array_equal(back, b)


def test_b5_golden_vector():
    # reference src/n_to_bits2.rs:275-279 (35 nt -> two words)
    s = np.frombuffer(b"ATCGN" * 7, np.uint8)
    got = spec.u32_pairs_to_u64(
        np.asarray(pk.encode_b5_words_pallas(jnp.asarray(np.concatenate(
            [s, np.full(54 - 35, ord("A"), np.uint8)])), interpret=True))
    )[:2]
    # padding to a word multiple must not change the first two words' bits
    want = oracle.n_to_bits2_lut(s)
    assert got[0] == want[0]
    # second word: 35-nt tail has missing digits as 0 == 'A' padding
    assert got[1] == want[1]


@pytest.mark.parametrize("n_rows", [1, 3])
def test_encode_b5_v2_matches_oracle(rng, n_rows):
    s = rng.choice(ALPHABET, size=n_rows * pk.B5_ROW_NT)
    x = jnp.asarray(s.reshape(n_rows, pk.B5_ROW_NT))
    got = np.asarray(pk.encode_b5_panels_v2(x, interpret=True))
    want = oracle.n_to_bits2_lut(s)
    assert np.array_equal(
        spec.u32_pairs_to_u64(np.ascontiguousarray(got.reshape(-1))), want
    )


def test_encode_b5_planar_feeds_decoder(rng):
    s = rng.choice(ALPHABET, size=2 * pk.B5_ROW_NT)
    x = jnp.asarray(s.reshape(2, pk.B5_ROW_NT))
    lo, hi = pk.encode_b5_planar(x, interpret=True)
    back = np.asarray(pk.decode_b5_panels(lo, hi, interpret=True))
    want = oracle.bits_to_n2_lut(oracle.n_to_bits2_lut(s), s.size)
    assert np.array_equal(back.reshape(-1), want)


def test_decode_b5_nt4_matches_oracle(rng):
    s = rng.choice(ALPHABET, size=2 * pk.B5_ROW_NT)
    lo, hi = pk.encode_b5_planar(
        jnp.asarray(s.reshape(2, pk.B5_ROW_NT)), interpret=True
    )
    nt4 = np.asarray(
        pk.decode_b5_nt4_panels(lo, hi, padded=False, interpret=True)
    )
    got = np.ascontiguousarray(nt4.reshape(-1)).view(np.uint8)
    want = oracle.bits_to_n2_lut(oracle.n_to_bits2_lut(s), s.size)
    assert np.array_equal(got, want)


def test_decode_b5_nt4_padded_matches_oracle(rng):
    """padded=True: slice g at lanes [112g, 112g+108), pads decode to 'AAAA'
    (the tile-aligned 896-lane form that avoids XLA's result-relayout copy)."""
    s = rng.choice(ALPHABET, size=2 * pk.B5_ROW_NT)
    lo, hi = pk.encode_b5_planar(
        jnp.asarray(s.reshape(2, pk.B5_ROW_NT)), interpret=True
    )
    out = np.asarray(pk.decode_b5_nt4_panels(lo, hi, padded=True, interpret=True))
    assert out.shape == (2, pk.B5_NT4_PAD_LANES)
    blocks = out.reshape(2, 8, 112)
    got = np.ascontiguousarray(
        np.ascontiguousarray(blocks[:, :, :108]).reshape(-1)
    ).view(np.uint8)
    want = oracle.bits_to_n2_lut(oracle.n_to_bits2_lut(s), s.size)
    assert np.array_equal(got, want)
    assert np.all(blocks[:, :, 108:] == 0x41414141)


def test_decode_b5_interleaved_matches_oracle(rng):
    """The interleaved-input kernel: u64 stream's u32 pairs in directly, no
    planarize pass; de-interleave lives in the gather matrices' row order."""
    s = rng.choice(ALPHABET, size=3 * pk.B5_ROW_NT)
    words = oracle.n_to_bits2_lut(s)  # u64[384]
    inter = np.ascontiguousarray(words).view("<u4").reshape(3, 256)
    out = np.asarray(
        pk.decode_b5_interleaved_panels(jnp.asarray(inter), interpret=True)
    )
    got = pk.depad_nt4_host(out)
    want = oracle.bits_to_n2_lut(words, s.size)
    assert np.array_equal(got, want)


def test_decode_b5_digits_matches_char_decode(rng):
    """The digit-domain device format (r05): same panel layout as the char
    decode, bytes are base-5 digits; digit_panels_to_chars is the exact
    boundary conversion back to the char panels."""
    from cute_nucleotides_tpu.ops import spec

    s = rng.choice(ALPHABET, size=2 * pk.B5_ROW_NT)
    words = oracle.n_to_bits2_lut(s)
    inter = np.ascontiguousarray(words).view("<u4").reshape(2, 256)
    digs = pk.decode_b5_digits_panels(jnp.asarray(inter), interpret=True)
    chars = np.asarray(
        pk.decode_b5_interleaved_panels(jnp.asarray(inter), interpret=True)
    )
    # digit bytes map through DIG_TO_CHAR_B5 to the char decode's bytes
    db = np.ascontiguousarray(np.asarray(digs)).view(np.uint8)
    cb = np.ascontiguousarray(chars).view(np.uint8)
    assert db.max() <= 4
    assert np.array_equal(spec.DIG_TO_CHAR_B5[db], cb)
    # and the fused conversion is bit-exact to the char kernel
    assert np.array_equal(np.asarray(pk.digit_panels_to_chars(digs)), chars)
    # the unimplemented checked+digits combination is rejected, not
    # silently served char panels (r05 review guard)
    import pytest

    with pytest.raises(ValueError, match="digit-domain"):
        pk._decode_b5_inter_call(
            jnp.asarray(inter), checked=True, interpret=True,
            row_block=8, digits=True,
        )


def test_encode_b5_checked_parity_and_flags(rng):
    import jax.numpy as jnp
    R = 16
    alpha = np.frombuffer(b"ATCGNatcgnu", dtype=np.uint8)
    x = rng.choice(alpha, size=(R, pk.B5_ROW_NT)).astype(np.uint8)
    xd = jnp.asarray(x)
    out, badplane = pk.encode_b5_panels_checked(xd, interpret=True)
    ref = np.asarray(pk.encode_b5_panels_v2(xd, interpret=True))
    assert np.array_equal(np.asarray(out), ref)
    assert not np.asarray(badplane).any()
    # poison a few rows with bytes that alias valid digits via &7
    for r, c, b in [(0, 0, ord("F")), (5, 3455, 0x00), (9, 1000, 0xC1), (12, 7, ord("Q"))]:
        x[r, c] = b
    _, badplane = pk.encode_b5_panels_checked(jnp.asarray(x), interpret=True)
    flags = np.asarray(badplane).any(axis=-1)
    assert list(np.nonzero(flags)[0]) == [0, 5, 9, 12]


def test_encode_b5_words_checked_scalar_flag(rng):
    import jax.numpy as jnp
    s = rng.choice(np.frombuffer(b"ATCGN", np.uint8), size=27 * 100)
    words, bad = pk.encode_b5_words_checked(jnp.asarray(s), interpret=True)
    ref = np.asarray(pk.encode_b5_words_pallas(jnp.asarray(s), interpret=True))
    assert np.array_equal(np.asarray(words), ref)
    assert not bool(bad)
    s[1234] = ord("E")
    _, bad = pk.encode_b5_words_checked(jnp.asarray(s), interpret=True)
    assert bool(bad)


def test_b5_checked_encode_accept_set_exhaustive():
    """The slot-LUT fused check (x & 0xD8 == 0x40 + VEXP[x&7] << 3) accepts
    exactly ops.validate's allow_n set on all 256 byte values, and the
    encoded words are identical to the unchecked kernel's."""
    import jax.numpy as jnp
    from cute_nucleotides_tpu.ops import validate

    x = np.tile(np.arange(256, dtype=np.uint8)[:, None], (1, pk.B5_ROW_NT))
    w, bad = pk.encode_b5_panels_checked(jnp.asarray(x), interpret=True)
    flag = np.asarray(jnp.any(bad != 0, axis=-1))
    want = ~np.asarray(
        validate.valid_mask(jnp.asarray(np.arange(256, dtype=np.uint8)), allow_n=True)
    )
    assert np.array_equal(flag, want)
    w0 = pk.encode_b5_panels_v2(jnp.asarray(x), interpret=True)
    assert np.array_equal(np.asarray(w), np.asarray(w0))


def test_decode_b5_checked_parity_and_flags(rng):
    """The fused checked decode: panels bit-exact to the unchecked kernel,
    badplane flags exactly the rows holding a corrupt u64 word (triplet
    >= 125 or pad bit 63) — first_invalid_word_b5's semantics on the
    decode's own HBM read."""
    R = 8
    s = rng.choice(ALPHABET, size=R * pk.B5_ROW_NT)
    words = oracle.n_to_bits2_lut(s)
    inter = np.ascontiguousarray(words).view("<u4").reshape(R, 256).copy()
    out, badplane = pk.decode_b5_interleaved_panels_checked(
        jnp.asarray(inter), interpret=True
    )
    ref = np.asarray(pk.decode_b5_interleaved_panels(jnp.asarray(inter), interpret=True))
    assert np.array_equal(np.asarray(out), ref)
    assert not np.asarray(badplane).any()
    # corrupt: row 1 word 3 triplet 0 -> 125; row 4 word 77 triplet 8 -> 127;
    # row 6 word 10 pad bit 63
    inter[1, 6] = (inter[1, 6] & ~np.uint32(0x7F)) | np.uint32(125)
    inter[4, 2 * 77 + 1] |= np.uint32(0x7F) << (7 * 8 - 32)
    inter[6, 2 * 10 + 1] |= np.uint32(1) << 31
    out2, badplane = pk.decode_b5_interleaved_panels_checked(
        jnp.asarray(inter), interpret=True
    )
    flags = np.asarray(badplane).any(axis=-1)
    assert list(np.nonzero(flags)[0]) == [1, 4, 6]
    # boundary: the largest VALID triplet (124) must not flag
    inter2 = np.ascontiguousarray(words).view("<u4").reshape(R, 256).copy()
    inter2[0, 0] = (inter2[0, 0] & ~np.uint32(0x7F)) | np.uint32(124)
    _, bp = pk.decode_b5_interleaved_panels_checked(jnp.asarray(inter2), interpret=True)
    assert not np.asarray(bp)[0].any()


def test_decode_b5_bytes_checked_scalar_flag(rng):
    s = rng.choice(np.frombuffer(b"ATCGN", np.uint8), size=27 * 100 + 13)
    w64 = oracle.n_to_bits2_lut(s)
    w = spec.u64_to_u32_pairs(w64).reshape(-1)
    out, bad = pk.decode_b5_bytes_checked(jnp.asarray(w), interpret=True)
    want = oracle.bits_to_n2_lut(w64, s.size)
    assert np.array_equal(np.asarray(out)[: s.size], want)
    assert not bool(bad)
    wbad = w.copy()
    wbad[11] |= np.uint32(1) << 31  # word 5 pad bit
    _, bad = pk.decode_b5_bytes_checked(jnp.asarray(wbad), interpret=True)
    assert bool(bad)


# --- GC content kernel (triplet extraction on the MXU) ----------------------


def _count_gc(s: np.ndarray) -> int:
    return int(np.sum(np.isin(s, np.frombuffer(b"CGcg", np.uint8))))


@pytest.mark.parametrize("n", [27, 500, 3456, 3457, 8208, 3456 * 3 + 5])
def test_gc_b5_stream_matches_byte_count(rng, n):
    s = rng.choice(ALPHABET, size=n)
    w32 = jnp.asarray(
        spec.u64_to_u32_pairs(oracle.n_to_bits2_lut(s)).reshape(-1)
    )
    got = int(pk.gc_content_b5_stream_pallas(w32, interpret=True))
    assert got == _count_gc(s)


def test_gc_b5_row_sums_panels(rng):
    # whole panels: per-row sums match the byte-domain count row by row
    R, row_nt = 4, 3456
    s = rng.choice(ALPHABET, size=(R, row_nt))
    rows = np.stack(
        [
            spec.u64_to_u32_pairs(oracle.n_to_bits2_lut(s[i])).reshape(-1)
            for i in range(R)
        ]
    )
    got = np.asarray(pk.gc_b5_row_sums(jnp.asarray(rows), interpret=True))
    want = np.array([_count_gc(s[i]) for i in range(R)])
    assert np.array_equal(got, want)


def test_gc_b5_seqops_routes_to_kernel(rng, monkeypatch):
    # the public seqops entry agrees with the XLA lane-parity form on both
    # sides of the routing threshold (>= 1024 u32 words -> Pallas stream
    # kernel); 27*1024 nt = 2048 u32 words is above, 513 nt below.  Wrap the
    # kernel to assert the above-threshold case really takes the Pallas route
    # (ADVICE r03: the old sizes never crossed the threshold).
    from cute_nucleotides_tpu.ops import pallas_kernels as pk_mod
    from cute_nucleotides_tpu.ops import seqops

    calls = []
    real = pk_mod.gc_content_b5_stream_pallas
    monkeypatch.setattr(
        pk_mod,
        "gc_content_b5_stream_pallas",
        lambda w, **kw: (calls.append(w.shape), real(w, **kw))[1],
    )
    for n, expect_kernel in [(513, False), (27 * 1024, True)]:
        s = rng.choice(ALPHABET, size=n)
        w32 = jnp.asarray(
            spec.u64_to_u32_pairs(oracle.n_to_bits2_lut(s)).reshape(-1)
        )
        before = len(calls)
        assert int(seqops.gc_content_packed_b5(w32)) == _count_gc(s)
        assert (len(calls) > before) == expect_kernel
