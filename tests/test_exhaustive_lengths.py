"""Exhaustive length/mod coverage (SURVEY §4a): every residue class.

Every length 1..96 covers each residue mod 32 three times (and mod 16 six
times); 1..81 covers each residue mod 27 three times.  The XLA tier runs the
full sweep (fast on CPU); the Pallas tier (interpret mode) samples the word
boundaries where tail handling changes shape.
"""

import numpy as np
import pytest

from cute_nucleotides_tpu import api
from cute_nucleotides_tpu.ops import oracle

ALPHA = np.frombuffer(b"ACGTUacgtu", dtype=np.uint8)
ALPHA_N = np.frombuffer(b"ACGTUNacgtun", dtype=np.uint8)


def test_all_lengths_2bit_xla(rng):
    for n in range(1, 97):
        s = rng.choice(ALPHA, size=n)
        w = api.n_to_bits(s, tier="xla")
        assert np.array_equal(w, oracle.n_to_bits_lut(s)), n
        back = api.bits_to_n(w, n, tier="xla")
        assert np.array_equal(back, oracle.bits_to_n_lut(w, n)), n


def test_all_lengths_b5_xla(rng):
    for n in range(1, 82):
        s = rng.choice(ALPHA_N, size=n)
        w = api.n_to_bits2(s, tier="xla")
        assert np.array_equal(w, oracle.n_to_bits2_lut(s)), n
        back = api.bits_to_n2(w, n, tier="xla")
        assert np.array_equal(back, oracle.bits_to_n2_lut(w, n)), n


@pytest.mark.parametrize("n", [15, 16, 17, 31, 32, 33, 47, 48, 49, 63, 64, 65])
def test_word_boundaries_2bit_pallas(rng, n):
    s = rng.choice(ALPHA, size=n)
    w = api.n_to_bits(s, tier="pallas")
    assert np.array_equal(w, oracle.n_to_bits_lut(s)), n
    back = api.bits_to_n(w, n, tier="pallas")
    assert np.array_equal(back, oracle.bits_to_n_lut(w, n)), n


@pytest.mark.parametrize("n", [26, 27, 28, 53, 54, 55, 80, 81])
def test_word_boundaries_b5_pallas(rng, n):
    s = rng.choice(ALPHA_N, size=n)
    w = api.n_to_bits2(s, tier="pallas")
    assert np.array_equal(w, oracle.n_to_bits2_lut(s)), n
    back = api.bits_to_n2(w, n, tier="pallas")
    assert np.array_equal(back, oracle.bits_to_n2_lut(w, n)), n
