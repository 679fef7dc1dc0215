"""Device-side input validation (the pass the reference deliberately lacks).

The reference's out-of-alphabet behavior is undefined (scalar LUT maps to 'A',
vector paths extract ASCII bits, bytes >= 128 are UB via ``get_unchecked`` —
reference src/n_to_bits.rs:42).  This framework defines encoding for all
bytes (see :mod:`.spec`) and additionally offers this optional, fused,
device-side validity check so strict pipelines can reject bad input without a
host pass.

All checks are case-insensitive.  ``U`` is always accepted (encodes as T,
reference src/n_to_bits.rs:14-19).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def valid_mask(x: jax.Array, *, allow_n: bool = False) -> jax.Array:
    """bool[...]: True where the byte is in {A,C,G,T,U[,N]} (either case)."""
    c = x & jnp.uint8(0xDF)  # fold lowercase
    ok = (c == ord("A")) | (c == ord("C")) | (c == ord("G"))
    ok = ok | (c == ord("T")) | (c == ord("U"))
    if allow_n:
        ok = ok | (c == ord("N"))
    return ok


def count_invalid(x: jax.Array, *, allow_n: bool = False) -> jax.Array:
    """i32 scalar (or leading-batch-shaped) count of invalid bytes."""
    return jnp.sum(~valid_mask(x, allow_n=allow_n), axis=-1).astype(jnp.int32)


def first_invalid(x: jax.Array, *, allow_n: bool = False) -> jax.Array:
    """Index of first invalid byte along the last axis, or -1 if none."""
    bad = ~valid_mask(x, allow_n=allow_n)
    idx = jnp.argmax(bad, axis=-1)
    any_bad = jnp.any(bad, axis=-1)
    return jnp.where(any_bad, idx, -1).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def jit_first_invalid(allow_n: bool = False):
    return jax.jit(functools.partial(first_invalid, allow_n=allow_n))


@functools.lru_cache(maxsize=None)
def jit_count_invalid(allow_n: bool = False):
    return jax.jit(functools.partial(count_invalid, allow_n=allow_n))
