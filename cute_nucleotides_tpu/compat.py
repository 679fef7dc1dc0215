"""Drop-in compatibility surface: the reference's 12 function names.

A user of the reference crate (``cute_nucleotides::n_to_bits::*``,
``::n_to_bits2::*``; reference src/lib.rs:1-2) can import these and get the
same names, signatures (bytes in / u64 words out, explicit decode length) and
bit-identical results.  Each x86-variant name maps to the TPU tier/variant
that fills its architectural slot (see docs/DESIGN.md §5):

================  =========================================================
reference name    this framework
================  =========================================================
n_to_bits_lut     scalar oracle (C++ native when available)
n_to_bits_pext    XLA whole-array, ``mul`` packing (no pext on TPU)
n_to_bits_shift   Pallas, ``shift`` (log-depth shift-OR tree)
n_to_bits_movemask Pallas, ``mul`` via identity-lane u8 store (the champion)
n_to_bits_mul     Pallas, ``mul`` (multiply-as-bit-shuffle, direct port)
bits_to_n_lut     scalar oracle
bits_to_n_shuffle Pallas, ``shuffle`` (packed-LUT variable shift — champion)
bits_to_n_pdep    XLA whole-array, ``shuffle``
bits_to_n_clmul   XLA whole-array, ``select`` (arithmetic select tree)
n_to_bits2_lut    scalar oracle
n_to_bits2_pext   Pallas MXU bit-scatter encoder
bits_to_n2_lut    scalar oracle
bits_to_n2_pdep   Pallas MXU expansion decoder
================  =========================================================

On CPU backends the Pallas-mapped names run in interpret mode (slow but
correct); use the device API (:mod:`.models`) for production throughput.
"""

from __future__ import annotations

import numpy as np

from . import api
from .ops import native

__all__ = [
    "n_to_bits_lut", "n_to_bits_pext", "n_to_bits_shift",
    "n_to_bits_movemask", "n_to_bits_mul",
    "bits_to_n_lut", "bits_to_n_shuffle", "bits_to_n_pdep", "bits_to_n_clmul",
    "n_to_bits2_lut", "n_to_bits2_pext", "bits_to_n2_lut", "bits_to_n2_pdep",
]


def n_to_bits_lut(n) -> np.ndarray:
    return native.n_to_bits(n)


def n_to_bits_pext(n) -> np.ndarray:
    return api.n_to_bits(n, tier="xla", variant="mul")


def n_to_bits_shift(n) -> np.ndarray:
    return api.n_to_bits(n, tier="pallas", variant="shift")


def n_to_bits_movemask(n) -> np.ndarray:
    return api.n_to_bits(n, tier="pallas", variant="mul")


def n_to_bits_mul(n) -> np.ndarray:
    return api.n_to_bits(n, tier="pallas", variant="mul")


def bits_to_n_lut(bits, length: int) -> np.ndarray:
    return native.bits_to_n(bits, length)


def bits_to_n_shuffle(bits, length: int) -> np.ndarray:
    return api.bits_to_n(bits, length, tier="pallas", variant="shuffle")


def bits_to_n_pdep(bits, length: int) -> np.ndarray:
    return api.bits_to_n(bits, length, tier="xla", variant="shuffle")


def bits_to_n_clmul(bits, length: int) -> np.ndarray:
    return api.bits_to_n(bits, length, tier="xla", variant="select")


def n_to_bits2_lut(n) -> np.ndarray:
    return native.n_to_bits2(n)


def n_to_bits2_pext(n) -> np.ndarray:
    return api.n_to_bits2(n, tier="pallas")


def bits_to_n2_lut(bits, length: int) -> np.ndarray:
    return native.bits_to_n2(bits, length)


def bits_to_n2_pdep(bits, length: int) -> np.ndarray:
    return api.bits_to_n2(bits, length, tier="pallas")
