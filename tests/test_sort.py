"""Layout-switching bitonic sort vs np.lexsort (the platform-sort oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cute_nucleotides_tpu.ops import sort


def _oracle(hi, lo):
    order = np.lexsort((lo, hi))
    return hi[order], lo[order]


def _check(hi, lo):
    # both dispatch targets must produce the exact lexsort: the default
    # lax path AND the bitonic kernel network (the measured-proof
    # artifact — interpret mode on the CPU mesh)
    wh, wl = _oracle(hi, lo)
    for prefer in ("lax", "bitonic"):
        hs, ls = sort.sort_pairs(
            jnp.asarray(hi), jnp.asarray(lo), prefer=prefer
        )
        assert np.array_equal(np.asarray(hs), wh), prefer
        assert np.array_equal(np.asarray(ls), wl), prefer


@pytest.mark.parametrize(
    "n",
    [
        1,
        17,
        4096 - 1,          # below the kernel route -> lax.sort fallback
        4 * sort.BITONIC_COLS,        # smallest kernel-path size, exact pow2
        8 * sort.BITONIC_COLS,
        8 * sort.BITONIC_COLS + 37,   # non-pow2 -> sentinel padding
        16 * sort.BITONIC_COLS - 1,
    ],
)
def test_sort_pairs_matches_lexsort(rng, n):
    hi = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    _check(hi, lo)


def test_sort_pairs_kmer_shaped_keys(rng):
    """The kmer_counts key distribution: small hi (2k-32 bits), many
    sentinel pairs at 0xFFFFFFFF, heavy lo duplication."""
    n = 8 * sort.BITONIC_COLS
    hi = rng.integers(0, 1 << 10, n, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 5000, n, dtype=np.uint64).astype(np.uint32)
    hi[-1500:] = 0xFFFFFFFF
    lo[-1500:] = 0xFFFFFFFF
    _check(hi, lo)


def test_sort_pairs_adversarial_orders(rng):
    n = 4 * sort.BITONIC_COLS
    asc = np.arange(n, dtype=np.uint32)
    _check(asc[::-1].copy(), asc.copy())          # descending hi
    _check(np.zeros(n, np.uint32), asc[::-1].copy())  # ties on hi
    _check(np.full(n, 7, np.uint32), np.full(n, 3, np.uint32))  # all equal
    # unsigned-order trap: values straddling the i32 sign bit
    hi = rng.integers(2**31 - 4, 2**31 + 4, n, dtype=np.uint64).astype(
        np.uint32
    )
    lo = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    _check(hi, lo)


def test_sort_pairs_rejects_bad_dtypes():
    with pytest.raises(TypeError):
        sort.sort_pairs(
            jnp.zeros(8, jnp.int32), jnp.zeros(8, jnp.uint32)
        )
    with pytest.raises(TypeError):
        sort.sort_pairs(jnp.zeros(8, jnp.uint32), jnp.zeros(9, jnp.uint32))
    with pytest.raises(ValueError, match="prefer"):
        sort.sort_pairs(
            jnp.zeros(8, jnp.uint32), jnp.zeros(8, jnp.uint32),
            prefer="bionic",
        )
