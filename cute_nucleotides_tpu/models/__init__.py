"""Batch codec "models": the device-array production API.

The reference's public surface is 12 free functions over host byte slices
(reference src/lib.rs:1-2).  The TPU-native production path instead operates
on resident device arrays of shape ``[batch, length]`` — a batch of reads —
because on TPU the unit of efficiency is a large batched launch, not a single
string.  These classes bundle the jitted kernels, padding logic, variant
registry, and sharding hooks into the two codec families:

* :class:`TwoBitCodec` — {A,C,G,T/U} <-> 2 bits/nt  (reference src/n_to_bits.rs)
* :class:`Base5Codec`  — {A,C,G,T/U,N} <-> 63 bits/27 nt (reference src/n_to_bits2.rs)

Both produce packed ``uint32`` device words whose little-endian stream is
bit-exact to the reference's ``Vec<u64>`` output.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spec, xla

__all__ = ["CodecConfig", "TwoBitCodec", "Base5Codec", "pad_batch"]


def _default_tier() -> str:
    # Mosaic kernels compile for TPU only (interpret mode covers CPU
    # tests); GPU backends must resolve to the portable XLA tier or
    # 'auto' would crash at first kernel lowering (r05 review).  TPU
    # plugins are NOT whitelisted by name — relayed/vendored plugins
    # report their own platform strings (this environment's reports
    # 'axon'), so known-GPU names are excluded instead.
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        platform = "cpu"
    return "xla" if platform in ("cpu", "gpu", "cuda", "rocm") else "pallas"


#: benched champion variant per tier (BENCH_r02/r03: pallas mul 545 GiB/s;
#: xla dot 84 vs mul 22, broadcast 67 vs swar 32 — the bitcast-free
#: formulations are the XLA tier's fast forms).  ``None`` variant arguments
#: resolve through these, so each tier defaults to its own fastest kernel
#: (the reference likewise names a per-situation best,
#: reference README.md:355-356).
DEFAULT_ENCODE_VARIANT = {"xla": "dot", "pallas": "mul", "oracle": "lut"}
DEFAULT_DECODE_VARIANT = {"xla": "broadcast", "pallas": "swar", "oracle": "lut"}


def default_encode_variant(tier: str) -> str:
    """The benched-champion 2-bit encode variant for a (resolved) tier."""
    if tier == "auto":
        tier = _default_tier()
    return DEFAULT_ENCODE_VARIANT[tier]


def default_decode_variant(tier: str) -> str:
    """The benched-champion 2-bit decode variant for a (resolved) tier."""
    if tier == "auto":
        tier = _default_tier()
    return DEFAULT_DECODE_VARIANT[tier]


#: variants that exist on exactly one tier (guarded with a clear error at
#: codec construction instead of a KeyError at first call)
_PALLAS_ONLY_ENCODE = ("mxu",)
_XLA_ONLY_ENCODE = ("dot",)
_XLA_ONLY_DECODE = ("broadcast",)


@functools.lru_cache(maxsize=None)
def _jit_any_invalid_rows():
    from ..ops import validate

    return jax.jit(lambda x: jnp.any(~validate.valid_mask(x), axis=-1))


@functools.lru_cache(maxsize=None)
def _jit_any_invalid_scalar_n():
    from ..ops import validate

    return jax.jit(lambda x: jnp.any(~validate.valid_mask(x, allow_n=True)))


@functools.lru_cache(maxsize=None)
def _jit_any_corrupt_scalar_b5():
    from ..ops import seqops

    return jax.jit(
        lambda w: jnp.any(seqops.first_invalid_word_b5(w) >= 0)
    )


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Typed configuration (the config system the reference lacks; SURVEY §5).

    Attributes:
      tier: "xla" (whole-array fused), "pallas" (hand-tiled kernels) or
        "auto" (pallas on accelerators, xla on CPU).
      encode_variant: packing strategy for the 2-bit encoder —
        "mul" (multiply-as-bit-shuffle, analogue of reference
        src/n_to_bits.rs:213), "shift" (log-depth shift-OR tree,
        src/n_to_bits.rs:121), "interleave" (even/odd plane split + fold,
        the movemask analogue, src/n_to_bits.rs:172), "mxu"
        (constant-matrix byte gather on the MXU, the pext analogue,
        src/n_to_bits.rs:80; pallas tier only) or "dot" (bitcast-free
        weighted small-dot packing, the maddubs-as-dot idea; xla tier
        only, its fastest form there).  ``None`` (the default) resolves
        to the tier's benched champion: "mul" on pallas, "dot" on xla.
      decode_variant: "swar" (byte-parallel spread-multiplies, the pdep
        descendant and the fastest, reference src/n_to_bits.rs:309),
        "shuffle" (packed-LUT variable shift, src/n_to_bits.rs:265),
        "select" (arithmetic select tree, the clmul slot,
        src/n_to_bits.rs:346) or "broadcast" (bitcast-free field
        broadcast; xla tier only, its fastest form there).  ``None``
        resolves to "swar" on pallas, "broadcast" on xla.
      donate: donate input buffers to the compiled call (the allocation-honest
        analogue of the reference's alloc-included benchmarks).
    """

    tier: str = "auto"
    encode_variant: str | None = None
    decode_variant: str | None = None
    donate: bool = False

    def resolved_tier(self) -> str:
        return _default_tier() if self.tier == "auto" else self.tier

    def resolved_encode_variant(self) -> str:
        if self.encode_variant is not None:
            return self.encode_variant
        return DEFAULT_ENCODE_VARIANT[self.resolved_tier()]

    def resolved_decode_variant(self) -> str:
        if self.decode_variant is not None:
            return self.decode_variant
        return DEFAULT_DECODE_VARIANT[self.resolved_tier()]


def pad_batch(
    reads: np.ndarray | list[bytes], block: int, fill: int = ord("A")
) -> tuple[np.ndarray, np.ndarray]:
    """Pad a batch of byte strings to a common block-aligned length.

    Returns ``(batch u8[B, Lpad], lengths i32[B])``.  Padding with 'A'
    (code 0 / digit 0) reproduces the reference's tail semantics: unused high
    bits zero (reference src/n_to_bits.rs:38-43), missing triplet digits zero
    (reference src/n_to_bits2.rs:58-70).
    """
    if isinstance(reads, np.ndarray):
        if reads.ndim != 2 or reads.dtype != np.uint8:
            raise TypeError("expected u8[B, L] array or list of bytes")
        lengths = np.full(reads.shape[0], reads.shape[1], dtype=np.int32)
        rem = (-reads.shape[1]) % block
        if rem:
            pad = np.full((reads.shape[0], rem), fill, dtype=np.uint8)
            reads = np.concatenate([reads, pad], axis=1)
        return reads, lengths
    lengths = np.array([len(r) for r in reads], dtype=np.int32)
    lpad = spec.cdiv(max((int(l) for l in lengths), default=0), block) * block
    out = np.full((len(reads), max(lpad, block)), fill, dtype=np.uint8)
    for i, r in enumerate(reads):
        out[i, : len(r)] = np.frombuffer(bytes(r), dtype=np.uint8)
    return out, lengths


class _CodecBase:
    """Shared jit/caching scaffolding for the two codec families."""

    def __init__(self, config: CodecConfig | None = None, **overrides):
        if config is None:
            config = CodecConfig(**overrides)
        elif overrides:
            config = dataclasses.replace(config, **overrides)
        self.config = config
        self.tier = config.resolved_tier()

    def _jit(self, fn, donate_arg: bool):
        kwargs = {}
        if donate_arg and self.config.donate:
            kwargs["donate_argnums"] = (0,)
        return jax.jit(fn, **kwargs)


class TwoBitCodec(_CodecBase):
    """Batched 2-bit codec: u8[..., L] <-> packed u32[..., L//16].

    Bit-exact to the reference's 2-bit family (encoders
    src/n_to_bits.rs:34-259, decoders :265-404); tested against its golden
    vectors (src/n_to_bits.rs:408-470).
    """

    #: nt per packed u32 word
    block = spec.NT_PER_WORD_2BIT  # pad granularity: one logical u64 (32 nt)

    def __init__(self, config: CodecConfig | None = None, **overrides):
        super().__init__(config, **overrides)
        self.encode_variant = self.config.resolved_encode_variant()
        self.decode_variant = self.config.resolved_decode_variant()
        if self.tier == "pallas":
            if self.encode_variant in _XLA_ONLY_ENCODE:
                raise ValueError(
                    f'encode_variant="{self.encode_variant}" is an '
                    'XLA-tier formulation; use tier="xla"'
                )
            if self.decode_variant in _XLA_ONLY_DECODE:
                raise ValueError(
                    f'decode_variant="{self.decode_variant}" is an '
                    'XLA-tier formulation; use tier="xla"'
                )
            from ..ops import pallas_kernels as pk

            self._encode = pk.jit_encode_2bit(self.encode_variant)
            self._decode = pk.jit_decode_2bit(self.decode_variant)
        elif self.encode_variant in _PALLAS_ONLY_ENCODE:
            raise ValueError(
                f'encode_variant="{self.encode_variant}" is a '
                'Pallas-tier kernel; use tier="pallas" (or "auto" on an '
                'accelerator)'
            )
        else:
            self._encode = self._jit(
                functools.partial(
                    xla.encode_2bit_words, variant=self.encode_variant
                ),
                donate_arg=True,
            )
            self._decode = self._jit(
                functools.partial(
                    xla.decode_2bit_bytes, variant=self.decode_variant
                ),
                donate_arg=True,
            )

    def encode(self, reads: jax.Array) -> jax.Array:
        """u8[..., L] -> u32[..., L//16]; L must be a multiple of 16."""
        return self._encode(reads)

    def encode_checked(self, reads: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Encode + per-row validity flag: u8[..., L] ->
        (u32[..., L//16], bool[...]).

        Flag row r is True iff it contains a byte outside {A,C,G,T,U}
        (either case).  On the pallas tier the check is FUSED into the
        encode kernel (one HBM read, ~13% encode tax vs 2.3x for a separate
        validate pass); elsewhere it composes encode with
        a cached jitted :func:`..ops.validate.valid_mask` pass (a second
        HBM read).  Diagnose flagged
        rows with :func:`..ops.validate.first_invalid`.
        """
        if self.tier == "pallas" and self.encode_variant != "mxu":
            from ..ops import pallas_kernels as pk

            return pk.jit_encode_2bit_checked(self.encode_variant)(reads)
        # the validity pass must read the input BEFORE the (possibly
        # donating) encode consumes its buffer (r05 review)
        bad = _jit_any_invalid_rows()(reads)
        return self.encode(reads), bad

    def decode(self, words: jax.Array) -> jax.Array:
        """u32[..., W] -> u8[..., 16*W] (full blocks; caller truncates)."""
        return self._decode(words)

    def encode_nt4(self, nt4: jax.Array) -> jax.Array:
        """Fast path: nt4 u32[R, C] (4 ASCII bytes/lane, a free host view of
        the byte stream) -> packed u8[R, C].  Skips the device-side bitcast
        the u8[B, L] path needs; see ops/pallas_kernels.encode_2bit_nt4.

        With ``encode_variant="mxu"`` the output is packed u32 *words*
        [R, C // 4] (the MXU pack emits whole words; C % 512 == 0)."""
        from ..ops import pallas_kernels as pk

        # nt4 is a Pallas-kernel fast path even on an xla-tier codec; an
        # xla-only resolved default falls back to the pallas champion
        v = self.encode_variant
        if v in _XLA_ONLY_ENCODE:
            v = DEFAULT_ENCODE_VARIANT["pallas"]
        if v == "mxu":
            return pk.jit_encode_2bit_nt4_mxu()(nt4)
        return pk.jit_encode_2bit_nt4(v)(nt4)

    def decode_nt4(self, packed: jax.Array) -> jax.Array:
        """Fast path: packed u8[R, C] -> nt4 u32[R, C]."""
        from ..ops import pallas_kernels as pk

        v = self.decode_variant
        if v in _XLA_ONLY_DECODE:
            v = DEFAULT_DECODE_VARIANT["pallas"]
        return pk.jit_decode_2bit_nt4(v)(packed)

    def words_per_read(self, length: int) -> int:
        return 2 * spec.num_words_2bit(length)  # u32 count

    def pad(self, reads):
        return pad_batch(reads, self.block)


class Base5Codec(_CodecBase):
    """Batched base-5 codec: u8[..., L] <-> packed u32[..., 2*(L//27)].

    Bit-exact to the reference's base-5 family (src/n_to_bits2.rs:37-268);
    tested against its golden vectors (src/n_to_bits2.rs:270-299).
    """

    #: nt per logical u64 word
    block = spec.NT_PER_WORD_B5

    def __init__(self, config: CodecConfig | None = None, **overrides):
        super().__init__(config, **overrides)
        if self.tier == "pallas":
            from ..ops import pallas_kernels as pk

            self._encode = pk.jit_encode_b5()
            self._decode = pk.jit_decode_b5()
        else:
            self._encode = self._jit(xla.encode_b5_words, donate_arg=True)
            self._decode = self._jit(xla.decode_b5_bytes, donate_arg=True)

    def encode(self, reads: jax.Array) -> jax.Array:
        """u8[..., L] -> u32[..., 2*(L//27)]; L must be a multiple of 27."""
        return self._encode(reads)

    def encode_checked(self, reads: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Encode + validity flag: u8[..., L] -> (u32[..., 2*(L//27)],
        bool scalar).

        The flag is True iff ANY byte is outside {A,C,G,T,U,N} (either
        case) — scalar (not per row) because base-5 kernel panels straddle
        input rows.  Fused into the encode kernel on the pallas tier;
        composed with :func:`..ops.validate.valid_mask` elsewhere.
        Diagnose with :func:`..ops.validate.first_invalid`.
        """
        if self.tier == "pallas":
            from ..ops import pallas_kernels as pk

            return pk.jit_encode_b5_checked()(reads)
        # check BEFORE the (possibly donating) encode consumes the buffer
        bad = _jit_any_invalid_scalar_n()(reads)
        return self.encode(reads), bad

    def decode(self, words: jax.Array) -> jax.Array:
        """u32[..., 2*W] -> u8[..., 27*W] (full blocks; caller truncates)."""
        return self._decode(words)

    def decode_checked(self, words: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Decode + stream-integrity flag: u32[..., 2*W] ->
        (u8[..., 27*W], bool scalar).

        The flag is True iff ANY u64 word of the stream is corrupt (a
        triplet value >= 125 or pad bit 63 set — base-5 words waste 3 of
        128 triplet codes, so container corruption is detectable; the
        2-bit stream has no invalid states).  Fused into the decode kernel
        on the pallas tier (it rides the decode's own HBM read); composed
        with :func:`..ops.seqops.first_invalid_word_b5` elsewhere — and
        use that scan to diagnose the word index on flagged batches.
        """
        if self.tier == "pallas":
            from ..ops import pallas_kernels as pk

            return pk.jit_decode_b5_checked()(words)
        # check BEFORE the (possibly donating) decode consumes the buffer
        bad = _jit_any_corrupt_scalar_b5()(words)
        return self.decode(words), bad

    def words_per_read(self, length: int) -> int:
        return 2 * spec.num_words_b5(length)

    def pad(self, reads):
        return pad_batch(reads, self.block)
