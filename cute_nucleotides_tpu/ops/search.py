"""Exact pattern search on the 2-bit packed domain, with N-wildcards.

``grep`` for packed nucleotide streams: find every position where a query
(up to thousands of nt) occurs, *without decoding* — the packed stream is
read once and compared word-against-word, so the scan moves ~1/4 the bytes
of an ASCII search.  ``N``/``n`` in the query is a wildcard (matches any
nucleotide), which is what degenerate primer/adapter searches need.

A match at position ``i`` means: for every query word ``wq``,
``(window32(i + 16*wq) ^ q[wq]) & care[wq] == 0`` where ``window32(p)`` is
the 32-bit funnel window starting at nucleotide ``p`` (the same two-tap
funnel as :func:`.kmer.kmer_codes`) and ``care`` has ``0b11`` in every
non-wildcard 2-bit field.  The reference has no search op — this extends
its packed-domain toolkit (reference src/n_to_bits.rs packs LSB-first,
which is what makes the window compare a plain shift-OR; see ops/spec.py).

Two tiers:

* **XLA gather tier** (:func:`match_mask`): position-ordered boolean mask
  via two ``jnp.take`` gathers per query word.  Simple, any length.
* **Pallas tier** (:func:`match_bits_rows`, driven by
  :func:`match_bits`): base rows plus a small separate halo array (each
  row's successor words, so every tap is an in-row slice — no cross-row
  neighbor exchange and no materialized overlap-panel copy), producing a
  PACKED bitmask ``u32[R, W]`` where bit ``s`` of lane ``w`` is the match
  flag for position ``16*(r*W + w) + s`` — 16 positions per output word,
  so the result stream is as small as the input stream.  The query is
  baked into the kernel as constants (cached per query), and the
  valid-start tail clear rides the kernel too (r04; the two wrapper
  passes they replace were 39% of the op).

Matching is over the *normalized* sequence (what decode emits: uppercase,
``U``→``T``) — queries may be any case and use ``U`` freely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import spec

__all__ = [
    "compile_query",
    "revcomp_query",
    "match_mask",
    "match_bits",
    "match_count",
    "match_positions",
    "match_mask_batch",
    "match_counts_batch",
    "compile_query_b5",
    "match_mask_b5",
    "match_count_b5",
    "match_positions_b5",
    "match_mask_b5_batch",
]

#: query bytes allowed (N/n are wildcards; everything else must be ACGTU)
_QUERY_OK = frozenset(b"ACGTUacgtuNn")


def compile_query(query: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Pack an ASCII query into ``(q u32[Wq], care u32[Wq], m)``.

    ``q`` holds the query's 2-bit codes LSB-first (the stream packing);
    ``care`` has ``0b11`` in each concrete field and ``0b00`` in wildcard
    (``N``) fields — wildcard fields of ``q`` are 0.  Raises on bytes
    outside ``{A,C,G,T,U,N}`` (either case): a typo'd query would
    otherwise silently search for its ``(byte >> 1) & 3`` alias.
    """
    if isinstance(query, str):
        query = query.encode()
    m = len(query)
    if m == 0:
        raise ValueError("empty query")
    bad = set(query) - _QUERY_OK
    if bad:
        raise ValueError(
            f"query contains non-ACGTUN bytes: {sorted(chr(b) for b in bad)}"
        )
    wq = -(-m // spec.NT_PER_U32_2BIT)
    q = np.zeros(wq, np.uint32)
    care = np.zeros(wq, np.uint32)
    for i, b in enumerate(query):
        w, f = divmod(i, spec.NT_PER_U32_2BIT)
        if b not in b"Nn":
            q[w] |= ((b >> 1) & 3) << (2 * f)
            care[w] |= 3 << (2 * f)
    return q, care, m


def revcomp_query(query: bytes) -> bytes:
    """Reverse-complement of an ASCII query (``N`` stays ``N``); search for
    this to find reverse-strand occurrences at forward coordinates."""
    if isinstance(query, str):
        query = query.encode()
    return query.upper().replace(b"U", b"T")[::-1].translate(
        bytes.maketrans(b"ACGTN", b"TGCAN")
    )


@functools.partial(jax.jit, static_argnames=("length", "m"))
def _match_mask_impl(
    words: jax.Array, q: jax.Array, care: jax.Array, length: int, m: int
) -> jax.Array:
    n = length - m + 1
    wq_n = q.shape[0]
    padded = jnp.concatenate([words, jnp.zeros(wq_n + 1, jnp.uint32)])
    i = jnp.arange(n)
    wl = i // spec.NT_PER_U32_2BIT
    s = (2 * (i % spec.NT_PER_U32_2BIT)).astype(jnp.uint32)
    z = jnp.uint32(0)
    diff = None
    for wq in range(wq_n):
        a = jnp.take(padded, wl + wq)
        b = jnp.take(padded, wl + wq + 1)
        win = (a >> s) | jnp.where(s == 0, z, b << (32 - s))
        d = (win ^ q[wq]) & care[wq]
        diff = d if diff is None else diff | d
    return diff == 0


def match_mask(
    words: jax.Array, length: int, query: bytes
) -> jax.Array:
    """Occurrence mask of ``query`` in a packed u32[W] stream:
    -> bool[length - m + 1], entry ``i`` true iff the query matches at
    nucleotide ``i``.  XLA gather tier — use :func:`match_bits` for the
    packed-bitmask Pallas scan."""
    if words.ndim != 1:
        raise TypeError("match_mask takes a flat u32 word stream")
    q, care, m = compile_query(query)
    if length - m + 1 <= 0:
        raise ValueError(f"stream length {length} shorter than query ({m})")
    if length > words.shape[0] * spec.NT_PER_U32_2BIT:
        raise ValueError("length exceeds stream capacity")
    return _match_mask_impl(
        words, jnp.asarray(q), jnp.asarray(care), length, m
    )


# --- Pallas tier ------------------------------------------------------------

#: output word lanes per panel row (the row's 16*W scan positions)
_SEARCH_W = 512


def _match_bits_kernel(q: tuple, care: tuple, n: int | None):
    """Scan kernel over (base, halo) row blocks.

    ``n`` (when given) is the valid-start count: the kernel clears bits at
    positions >= n in place of the r03 wrapper's separate full-array
    iota/clip/mask pass — the wrapper passes (the panel-copy concat and
    the tail clear) cost 39% of the op at 7 nt (kernel-only 97 GiB/s vs
    59 end-to-end, measured r04), so both now ride the kernel.  The
    per-phase funnel is shared across query words; NOTE the r03
    per-(phase, word) form compiled to identical code (Mosaic CSEs the
    funnels — measured equal at 97.0/24.5 GiB/s), so the sharing is for
    source clarity, not speed.

    Multi-word queries take an **anchor-word prefilter** (r05): the full
    16-phase bitmask is computed for the highest-information query word
    alone (a single-word scan), and the remaining words' folds run ONLY
    when the block holds at least one anchor candidate (``pl.when``) —
    anchor hits are ~|stream| * 4^-16-sparse on non-repetitive data, so
    long-query scans run at single-word speed regardless of length
    (hardware A/B tools/tune_search_rot.py: 45 nt 24.0 -> 81.7 GiB/s,
    141 nt 10.2 -> 81.1; the dense worst case — poly-A query on a
    poly-A stream, every block verifying — measured 42.5 vs the old
    24.2, i.e. the prefilter never loses).  Single-word queries keep
    the direct fold (the prefilter's skeleton alone costs ~14% there).
    """
    from jax.experimental import pallas as pl

    wq_n = len(q)
    anchor = max(range(wq_n), key=lambda w: bin(care[w]).count("1"))

    def kernel(b_ref, h_ref, o_ref):
        rb, W = o_ref.shape
        x = jnp.concatenate([b_ref[:], h_ref[:]], axis=1)

        def fold(words):
            bits = jnp.zeros((rb, W), jnp.uint32)
            for s in range(spec.NT_PER_U32_2BIT):
                if s:
                    lo = jax.lax.slice(x, (0, 0), (rb, W + wq_n))
                    hi = jax.lax.slice(x, (0, 1), (rb, W + wq_n + 1))
                    win = (lo >> (2 * s)) | (hi << (32 - 2 * s))
                else:
                    win = jax.lax.slice(x, (0, 0), (rb, W + wq_n))
                diff = None
                for wq in words:
                    d = (
                        jax.lax.slice(win, (0, wq), (rb, wq + W))
                        ^ jnp.uint32(q[wq])
                    ) & jnp.uint32(care[wq])
                    diff = d if diff is None else diff | d
                bits = bits | jnp.where(
                    diff == 0, jnp.uint32(1 << s), jnp.uint32(0)
                )
            return bits

        def clear_tail(bits, row0):
            if n is None:
                return bits
            # clear starts past n - 1: lane (r, w) covers [16*(r*W+w), +16)
            lane_base = 16 * (
                (row0 + jax.lax.broadcasted_iota(jnp.int32, (rb, W), 0)) * W
                + jax.lax.broadcasted_iota(jnp.int32, (rb, W), 1)
            )
            v = jnp.clip(n - lane_base, 0, 16).astype(jnp.uint32)
            return bits & ((jnp.uint32(1) << v) - 1)

        row0 = pl.program_id(0) * rb
        if wq_n == 1:
            o_ref[:] = clear_tail(fold([0]), row0)
            return
        bits0 = fold([anchor])
        o_ref[:] = jnp.zeros((rb, W), jnp.uint32)

        @pl.when(jnp.any(bits0 != 0))
        def _():
            rest = [w for w in range(wq_n) if w != anchor]
            o_ref[:] = clear_tail(bits0 & fold(rest), row0)

    return kernel


def match_bits_rows(
    base: jax.Array,
    halo: jax.Array,
    q: tuple,
    care: tuple,
    n: int | None = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """(base u32[R, W], halo u32[R, over]) -> packed match bits u32[R, W].

    ``halo[r]`` holds the ``over`` stream words following row ``r``'s
    last word (zeros beyond the stream); ``over`` must be 128-aligned and
    > len(q).  Keeping the halo as its own small array (0.25x the base at
    W=512) instead of materializing (rows, W + over) panels saves the
    1.25x HBM copy the r03 wrapper paid.
    """
    from . import pallas_kernels as pk
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = pk._auto_interpret(interpret)
    R, W = base.shape
    over = halo.shape[1]
    if base.dtype != jnp.uint32 or W % 128 or over % 128 or over <= len(q):
        raise TypeError(
            f"expected u32 base/halo with 128-aligned widths, got "
            f"{base.shape}/{halo.shape} for {len(q)} query words"
        )
    rb = min(32, max(8, -(-R // 8) * 8))
    return pl.pallas_call(
        _match_bits_kernel(
            tuple(int(v) for v in q), tuple(int(v) for v in care), n
        ),
        grid=(pk._cdiv(R, rb),),
        in_specs=[
            pl.BlockSpec((rb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rb, over), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rb, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.uint32),
        interpret=interpret,
    )(base, halo)


def match_bits_panels(
    x: jax.Array, q: tuple, care: tuple, *, interpret: bool = False
) -> jax.Array:
    """Overlapping u32[R, W + pad] panels -> packed match bits u32[R, W].

    Bit ``s`` of output lane ``(r, w)`` flags a query match starting at
    panel position ``16 w + s`` of row ``r``; the input rows carry
    ``len(q) + 1`` successor words past ``W`` (lane-padded to 128) so
    every funnel tap is an in-row static slice.  The query/care words are
    Python ints baked into the kernel (compiled per query).
    """
    R, Wp = x.shape
    W = Wp - 128 * (-(-(len(q) + 1) // 128))
    if x.dtype != jnp.uint32 or W <= 0 or W % 128:
        raise TypeError(
            f"expected u32 panels with 128-aligned overlap, got {x.dtype}{x.shape}"
        )
    return match_bits_rows(
        x[:, :W], x[:, W:], q, care, None, interpret=interpret
    )


@functools.partial(
    jax.jit, static_argnames=("length", "q", "care", "m", "interpret")
)
def _match_bits_impl(
    words: jax.Array,
    length: int,
    q: tuple,
    care: tuple,
    m: int,
    interpret: bool,
) -> jax.Array:
    flat = words.reshape(-1)
    Wtot = flat.shape[0]
    W = _SEARCH_W
    rows = -(-Wtot // W)
    over = 128 * (-(-(len(q) + 1) // 128))
    # row r = words[r*W : r*W + W + over]: base is the plain reshape and
    # the overlap rides a SEPARATE (rows, over) halo array (next row's
    # head words, zeros beyond the stream) — no (rows, W + over) panel
    # copy, and the valid-start tail clear is fused into the kernel
    # (together those wrapper passes were 39% of the op at 7 nt; r04)
    pad = rows * W - Wtot
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.uint32)])
    base = flat.reshape(rows, W)
    halo = jnp.concatenate(
        [base[1:, :over], jnp.zeros((1, over), jnp.uint32)], axis=0
    ) if over <= W else None
    if halo is None:  # huge query: overlap wider than a panel row
        padded = jnp.concatenate([flat, jnp.zeros(over, jnp.uint32)])
        halo = jnp.stack(
            [jax.lax.dynamic_slice(padded, (r * W + W,), (over,)) for r in range(rows)]
        )
    return match_bits_rows(
        base, halo, q, care, length - m + 1, interpret=interpret
    )


def match_bits(
    words: jax.Array, length: int, query: bytes, *, interpret: bool = False
) -> jax.Array:
    """Packed occurrence bitmask of ``query``: -> u32[rows, 512] where bit
    ``s`` of lane ``(r, w)`` flags a match at nucleotide
    ``16*(512 r + w) + s``.  Pallas scan tier: one memory pass over the
    stream; the packed bitmask is the same word count as the input (1/4
    of the ASCII byte stream)."""
    if words.ndim != 1:
        raise TypeError("match_bits takes a flat u32 word stream")
    q, care, m = compile_query(query)
    if length - m + 1 <= 0:
        raise ValueError(f"stream length {length} shorter than query ({m})")
    if length > words.shape[0] * spec.NT_PER_U32_2BIT:
        raise ValueError("length exceeds stream capacity")
    return _match_bits_impl(
        words, length, tuple(int(v) for v in q), tuple(int(v) for v in care),
        m, interpret,
    )


def match_count(
    words: jax.Array, length: int, query: bytes, *, interpret: bool = False
) -> jax.Array:
    """Number of occurrences of ``query`` (scalar i32, on device)."""
    bits = match_bits(words, length, query, interpret=interpret)
    return jax.lax.population_count(bits).sum().astype(jnp.int32)


def match_positions(
    words: jax.Array, length: int, query: bytes, *, interpret: bool = False
) -> np.ndarray:
    """Sorted occurrence positions (host ndarray) — the `grep` output form."""
    bits = np.asarray(match_bits(words, length, query, interpret=interpret))
    r, w = np.nonzero(bits)
    pos = []
    for ri, wi in zip(r, w):
        b = int(bits[ri, wi])
        base = 16 * (ri * bits.shape[1] + wi)
        pos.extend(base + s for s in range(16) if (b >> s) & 1)
    return np.asarray(sorted(pos), dtype=np.int64)


# --- batched search ----------------------------------------------------------
# The streaming pipeline's unit is a padded batch of independent reads
# (u8[B, L] -> packed u32[B, W]); the batched scans run the single-stream
# match per row under vmap (rows never see each other's words) and mask
# ragged tails with the true per-read lengths — same shape discipline as
# kmer_histogram_batch.


def _ragged_mask(mask: jax.Array, lengths: jax.Array, m: int) -> jax.Array:
    i = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    return mask & (i < (lengths - (m - 1))[:, None])


@functools.partial(jax.jit, static_argnames=("qt", "ct", "m"))
def _match_mask_batch_impl(
    words: jax.Array, lengths: jax.Array, qt: tuple, ct: tuple, m: int
) -> jax.Array:
    q = jnp.asarray(np.array(qt, np.uint32))
    care = jnp.asarray(np.array(ct, np.uint32))
    cap = words.shape[1] * spec.NT_PER_U32_2BIT
    mask = jax.vmap(lambda w: _match_mask_impl(w, q, care, cap, m))(words)
    return _ragged_mask(mask, lengths, m)


def _norm_lengths(lengths, B: int) -> jax.Array:
    return jnp.broadcast_to(jnp.asarray(lengths, jnp.int32).reshape(-1), (B,))


def match_mask_batch(words: jax.Array, lengths, query: bytes) -> jax.Array:
    """Occurrence mask of ``query`` in each row of a packed 2-bit batch:
    u32[B, W] + lengths -> bool[B, 16 W - m + 1]; entry ``(b, i)`` true iff
    the query matches read ``b`` at position ``i`` (positions past
    ``lengths[b] - m`` are always false)."""
    if words.ndim != 2:
        raise TypeError("match_mask_batch takes a packed u32[B, W] batch")
    q, care, m = compile_query(query)
    if words.shape[1] * spec.NT_PER_U32_2BIT - m + 1 <= 0:
        raise ValueError(f"row capacity shorter than query ({m})")
    return _match_mask_batch_impl(
        words,
        _norm_lengths(lengths, words.shape[0]),
        tuple(int(v) for v in q),
        tuple(int(v) for v in care),
        m,
    )


@functools.partial(jax.jit, static_argnames=("qc", "m"))
def _match_mask_b5_batch_impl(
    words: jax.Array, lengths: jax.Array, qc: tuple, m: int
) -> jax.Array:
    cap = (words.shape[1] // 2) * spec.NT_PER_WORD_B5
    mask = jax.vmap(lambda w: _match_mask_b5_impl(w, cap, qc, m))(words)
    return _ragged_mask(mask, lengths, m)


def match_mask_b5_batch(words: jax.Array, lengths, query: bytes) -> jax.Array:
    """Batched :func:`match_mask_b5`: interleaved u32[B, 2 Wb] + lengths ->
    bool[B, 27 Wb - m + 1] (``N`` literal, ``?`` wildcard)."""
    if words.ndim != 2 or words.shape[1] % 2:
        raise TypeError(
            "match_mask_b5_batch takes an interleaved u32[B, 2W] batch"
        )
    m = len(query)
    if (words.shape[1] // 2) * spec.NT_PER_WORD_B5 - m + 1 <= 0:
        raise ValueError(f"row capacity shorter than query ({m})")
    return _match_mask_b5_batch_impl(
        words, _norm_lengths(lengths, words.shape[0]), _qc_host(query), m
    )


def match_counts_batch(
    words: jax.Array, lengths, query: bytes, *, codec: str = "2bit"
) -> jax.Array:
    """Per-read occurrence counts: -> i32[B] (on device)."""
    fn = match_mask_batch if codec == "2bit" else match_mask_b5_batch
    return jnp.sum(fn(words, lengths, query), axis=1).astype(jnp.int32)


# --- base-5 codec ------------------------------------------------------------
# The base-5 stream has a REAL ``N`` symbol, so ``N`` in a base-5 query is a
# literal (matches stream N exactly) and the wildcard is ``?``.  Matching
# works at the TRIPLET level: each packed 7-bit value v = a + 5b + 25c is
# converted once to the digit-isolated base-8 form ``a | b<<3 | c<<6`` (two
# exact multiply-shifts — the same Lemire constants the decoder uses,
# reference src/n_to_bits2.rs:210-211), after which a per-digit comparison
# is a plain XOR + care mask, exactly like the 2-bit tier.  A query at
# stream position p only constrains triplets, so the scan runs three
# phase-aligned folds (p mod 3 = 0, 1, 2) over the triplet stream and
# interleaves the three masks.

_QUERY_B5_OK = frozenset(b"ACGTUNacgtun?")


def compile_query_b5(
    query: bytes,
) -> tuple[tuple[np.ndarray, np.ndarray], ...]:
    """Pack an ASCII base-5 query into three phase-aligned
    ``(q8 u32[T], care8 u32[T])`` tables (phase = start position mod 3).

    ``q8[j]`` holds the query digits covering stream triplet ``j`` in
    base-8 slots (3 bits per digit); ``care8`` has ``0b111`` per concrete
    slot and 0 for ``?`` wildcards and slots outside the query.  Raises on
    bytes outside ``{A,C,G,T,U,N,?}`` (either case).
    """
    if isinstance(query, str):
        query = query.encode()
    m = len(query)
    if m == 0:
        raise ValueError("empty query")
    bad = set(query) - _QUERY_B5_OK
    if bad:
        raise ValueError(
            f"query contains non-ACGTUN? bytes: {sorted(chr(b) for b in bad)}"
        )
    digits = [
        None if b == ord("?") else int(spec.DIGIT_LUT8[b & 7])
        for b in query
    ]
    out = []
    for phase in range(3):
        T = -(-(phase + m) // 3)
        q8 = np.zeros(T, np.uint32)
        care8 = np.zeros(T, np.uint32)
        for i, d in enumerate(digits):
            if d is None:
                continue
            j, slot = divmod(phase + i, 3)
            q8[j] |= d << (3 * slot)
            care8[j] |= 7 << (3 * slot)
        out.append((q8, care8))
    return tuple(out)


def _b5_triplets_b8(words: jax.Array) -> jax.Array:
    """Interleaved base-5 u32[2W] stream -> digit-isolated triplets
    u32[9W] (``a | b<<3 | c<<6`` per triplet, stream order)."""
    lo = words[0::2]
    hi = words[1::2]
    cols = []
    for j in range(9):
        b = 7 * j
        if b + 7 <= 32:
            t = lo >> b
        elif b >= 32:
            t = hi >> (b - 32)
        else:
            t = (lo >> b) | (hi << (32 - b))
        cols.append(t & jnp.uint32(0x7F))
    v = jnp.stack(cols, axis=1).reshape(-1)
    v5 = (v * jnp.uint32(205)) >> 10
    v25 = (v * jnp.uint32(41)) >> 10
    return (v - 5 * v5) | ((v5 - 5 * v25) << 3) | (v25 << 6)


@functools.partial(jax.jit, static_argnames=("length", "qc", "m"))
def _match_mask_b5_impl(
    words: jax.Array, length: int, qc: tuple, m: int
) -> jax.Array:
    n = length - m + 1
    t8 = _b5_triplets_b8(words)
    U = -(-n // 3)  # phase-fold length (triplet starts per phase)
    Tmax = max(len(q8) for q8, _ in qc)
    pad = U + Tmax - t8.shape[0]
    if pad > 0:
        # stream triplets past capacity read as 0 ('AAA'); masked below
        t8 = jnp.concatenate([t8, jnp.zeros(pad, jnp.uint32)])
    phase_masks = []
    for phase in range(3):
        q8, care8 = qc[phase]
        diff = None
        for j in range(len(q8)):
            cj = int(care8[j])
            if not cj:
                continue
            d = (t8[j : j + U] ^ jnp.uint32(int(q8[j]))) & jnp.uint32(cj)
            diff = d if diff is None else diff | d
        phase_masks.append(
            jnp.ones(U, bool) if diff is None else diff == 0
        )
    mask = jnp.stack(phase_masks, axis=1).reshape(-1)[:n]
    # positions past the last valid start were folded from padded/overhang
    # triplets; the [:n] truncation above is exact because position
    # p = 3u + phase lands at flat index 3u + phase
    return mask


def match_mask_b5(words: jax.Array, length: int, query: bytes) -> jax.Array:
    """Occurrence mask of ``query`` in a base-5 packed u32[2W] interleaved
    stream: -> bool[length - m + 1].  ``N`` in the query is a literal
    (base-5 has a real N digit); ``?`` is the any-nucleotide wildcard."""
    if words.ndim != 1 or words.shape[0] % 2:
        raise TypeError(
            "match_mask_b5 takes a flat interleaved u32[2W] stream"
        )
    m = len(query)
    if length - m + 1 <= 0:
        raise ValueError(f"stream length {length} shorter than query ({m})")
    if length > (words.shape[0] // 2) * spec.NT_PER_WORD_B5:
        raise ValueError("length exceeds stream capacity")
    return _match_mask_b5_impl(words, length, _qc_host(query), m)


# --- base-5 Pallas scan tier -------------------------------------------
# Packed-bitmask kernel scan mirroring the 2-bit tier: triplet extraction
# rides the MXU (in-kernel de-interleave matmuls + funnel shifts — no
# strided slices, no stack/reshape relayouts), the phase folds are in-row
# slice compares, and the output packs one u32 of 27 match bits per u64
# word — the result stream is half the size of the input words.

#: route flat streams at or above this many u32 words to the kernel scan
_B5_SEARCH_THRESHOLD = 1024

#: kernel tier query-length cap (nt): the fold unrolls 27 * T(query)
#: compares, so very long queries would explode compile time; the XLA
#: tier handles them
_B5_SEARCH_MAX_QUERY = 1024


def _qc_host(query: bytes) -> tuple:
    qc = compile_query_b5(query)
    return tuple(
        (tuple(int(v) for v in q8), tuple(int(v) for v in c8))
        for q8, c8 in qc
    )


@functools.partial(
    jax.jit, static_argnames=("length", "qc", "m", "interpret")
)
def _match_bits_b5_impl(
    words: jax.Array, length: int, qc: tuple, m: int, interpret: bool
) -> jax.Array:
    from . import pallas_kernels as pk

    RW = pk.B5_SEARCH_WORDS      # u64 words per row
    OV = 2 * pk.B5_SEARCH_OVW    # overlap u32 lanes per row
    flat = words.reshape(-1)
    rows = -(-flat.shape[0] // (2 * RW))
    pad = rows * 2 * RW - flat.shape[0]
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.uint32)])
    base = flat.reshape(rows, 2 * RW)
    # the overlap rides its own quarter-size halo array and the
    # valid-start clear is fused in-kernel (the 2-bit scan's r04 rework)
    halo = jnp.concatenate(
        [base[1:, :OV], jnp.zeros((1, OV), jnp.uint32)], axis=0
    )
    # force materialized native-tiled operands: fused pad/reshape chains
    # hand the kernel {1,0}-linear layouts that Mosaic retiles on its
    # scoped-vmem stack (measured: 31 MB > the 16 MB limit at R=59)
    base, halo = jax.lax.optimization_barrier((base, halo))
    return pk.match_b5_bits_rows(
        base, halo, qc, length - m + 1, interpret=interpret
    )


def match_bits_b5(
    words: jax.Array, length: int, query: bytes, *, interpret: bool = False
) -> jax.Array:
    """Packed occurrence bitmask of ``query`` in a base-5 interleaved
    stream: -> u32[rows, 512] where bit ``b`` of lane ``(r, w)`` flags a
    match at nucleotide ``27*(512 r + w) + b`` (``b < 27``).  Pallas scan
    tier — one memory pass, MXU triplet extraction; ``N`` is a literal,
    ``?`` the wildcard, as in :func:`match_mask_b5`."""
    if words.ndim != 1 or words.shape[0] % 2:
        raise TypeError("match_bits_b5 takes a flat interleaved u32[2W] stream")
    m = len(query)
    if m > _B5_SEARCH_MAX_QUERY:
        raise ValueError(
            f"kernel scan caps queries at {_B5_SEARCH_MAX_QUERY} nt (got "
            f"{m}); use match_mask_b5"
        )
    qc = _qc_host(query)
    if length - m + 1 <= 0:
        raise ValueError(f"stream length {length} shorter than query ({m})")
    if length > (words.shape[0] // 2) * spec.NT_PER_WORD_B5:
        raise ValueError("length exceeds stream capacity")
    return _match_bits_b5_impl(words, length, qc, m, interpret)


def _use_b5_kernel(words: jax.Array, query) -> bool:
    return (
        words.shape[0] >= _B5_SEARCH_THRESHOLD
        and len(query) <= _B5_SEARCH_MAX_QUERY
    )


def match_count_b5(words: jax.Array, length: int, query: bytes) -> jax.Array:
    """Number of occurrences of ``query`` in a base-5 stream (i32, device).

    Long flat streams ride the Pallas packed-bitmask scan; short ones the
    XLA gather tier (bit-identical results either way)."""
    if words.ndim == 1 and _use_b5_kernel(words, query):
        bits = match_bits_b5(words, length, query)
        return jax.lax.population_count(bits).sum().astype(jnp.int32)
    return jnp.sum(match_mask_b5(words, length, query)).astype(jnp.int32)


def match_positions_b5(
    words: jax.Array, length: int, query: bytes
) -> np.ndarray:
    """Sorted occurrence positions in a base-5 stream (host ndarray)."""
    if words.ndim == 1 and _use_b5_kernel(words, query):
        bits = np.asarray(match_bits_b5(words, length, query))
        r, w = np.nonzero(bits)
        W = bits.shape[1]
        pos = []
        for ri, wi in zip(r, w):
            b = int(bits[ri, wi])
            base = 27 * (ri * W + wi)
            pos.extend(base + s for s in range(27) if (b >> s) & 1)
        return np.asarray(sorted(pos), dtype=np.int64)
    mask = np.asarray(match_mask_b5(words, length, query))
    return np.nonzero(mask)[0].astype(np.int64)
