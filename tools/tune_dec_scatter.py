"""On-TPU A/B for decode_b5 scatter-restructure variants (round 3, session 3).

The interleaved decoder is VPU-bound at ~2.3x its max(mem, MXU) roofline and
~44% of its t-domain lanes are TPAD padding (9 used of 16 per word,
docs/DESIGN.md SS4).  These variants restructure the MATMULS — unlike
tools/tune_dec_vpu.py, which only trimmed vector ops around them:

  VD  dense t-layout: gather emits 144 triplet cols per slice (col 9w+j,
      no TPAD) and the quad scatter shrinks to K=432 (-44% int8 MACs);
      the digit path is unchanged.
  VQ8 fold the digit extraction INTO the scatter: d_k = q_k - 5*q_{k+1}
      is LINEAR in the [t, q5, q25] planes, so a bf16 scatter with
      coefficients {8^b, -5*8^b, 3*8^b} (all small-odd x 2^n, bf16-exact;
      sums < 2^19, f32-exact) emits the whole nt4 lane as one base-8 quad
      v8 = sum 8^b d_b <= 2340.  Deletes the digs subtraction, the int8
      cast, the quad div/mod chain and the pd assembly from the VPU; the
      re-split is 10 cheap ops on ONE tile.  Dense (K=432) and TPAD
      (K=768, tile-aligned concat) forms — the dense concat lands at
      non-128 lane offsets, cost unknown, so both are measured.
  VH  same fold but emitting 16-bit HALVES (d_even + 256*d_odd, cols
      m / 128+m; coefficients {1, 256, -5, -1280, 251} all bf16-exact):
      N=256 buys a 3-op combine instead of VQ8's 10-op re-split.
  VP  same fold on the int8 MXU: PAIR cols (d_even + 8*d_odd, weights
      {1, 8, -5, -40, 3} all int8); N=256, 7-op expand.

Exactness of the folded coefficients (why bf16 is safe here): every
coefficient is (odd <= 11) x 2^n — at most 4 significant bits, exact in
bf16's 8-bit mantissa; t <= 124 carries 7 bits; every product < 2^19 and
every accumulated sum < 2^21, inside f32's exact-integer range.

Same-process profiler device durations only (docs/DESIGN.md SS7).

    PYTHONPATH=.:/root/.axon_site timeout 1800 python tools/tune_dec_scatter.py
    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/tune_dec_scatter.py --selftest
"""

from __future__ import annotations

import sys

import numpy as np


def _np_bf16():
    import jax.numpy as jnp

    return jnp.bfloat16


def build_gather_dense(pk) -> np.ndarray:
    """(128, 144) bf16: the fold-the-splice gather with dense cols 9w+j."""
    gf = np.asarray(pk._b5_dec_gather_fold_bf16(), np.float32)  # (128, 256)
    g = np.zeros((128, 144), np.float32)
    for w in range(pk.B5_SLICE_WORDS):
        g[:, 9 * w : 9 * w + 9] = gf[:, pk.B5_TPAD * w : pk.B5_TPAD * w + 9]
    return g.astype(_np_bf16())


def _positions(pk):
    """Yield (w, j, k, t_col_dense, t_col_tpad, m, b) per digit position."""
    for w in range(pk.B5_SLICE_WORDS):
        for j in range(9):
            for k in range(3):
                p = 27 * w + 3 * j + k
                yield w, j, k, 9 * w + j, pk.B5_TPAD * w + j, p // 4, p % 4


def build_scatter_quads_dense(pk) -> np.ndarray:
    """(432, 128) int8: the shipped quad scatter on dense t rows."""
    s = np.zeros((432, 128), np.int8)
    for _w, _j, k, td, _tt, m, b in _positions(pk):
        s[144 * k + td, m] = 5**b
    return s


def build_scatter_q8(pk, dense: bool) -> np.ndarray:
    """bf16 scatter [t|q5|q25] -> base-8 quads v8 = sum 8^b * d(4m+b)."""
    T = 144 if dense else pk.B5_SLICE_WORDS * pk.B5_TPAD
    s = np.zeros((3 * T, 128), np.float32)
    for _w, _j, k, td, tt, m, b in _positions(pk):
        row = td if dense else tt
        s[T * k + row, m] += float(8**b)
        if k < 2:
            s[T * (k + 1) + row, m] -= 5.0 * float(8**b)
    return s.astype(_np_bf16())


def build_scatter_halves(pk) -> np.ndarray:
    """(432, 256) bf16 scatter [t|q5|q25] -> 16-bit halves d_e + 256*d_o."""
    s = np.zeros((432, 256), np.float32)
    for _w, _j, k, td, _tt, m, b in _positions(pk):
        col = m if b < 2 else 128 + m
        wgt = 1.0 if b % 2 == 0 else 256.0
        s[144 * k + td, col] += wgt
        if k < 2:
            s[144 * (k + 1) + td, col] -= 5.0 * wgt
    return s.astype(_np_bf16())


def build_scatter_pairs_i8(pk) -> np.ndarray:
    """(432, 256) int8 scatter [t|q5|q25] -> base-8 pairs d_e + 8*d_o."""
    s = np.zeros((432, 256), np.int16)
    for _w, _j, k, td, _tt, m, b in _positions(pk):
        col = m if b < 2 else 128 + m
        wgt = 1 if b % 2 == 0 else 8
        s[144 * k + td, col] += wgt
        if k < 2:
            s[144 * (k + 1) + td, col] -= 5 * wgt
    assert s.min() >= -128 and s.max() <= 127
    return s.astype(np.int8)


def main() -> int:
    selftest = "--selftest" in sys.argv
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cute_nucleotides_tpu.ops import oracle, pallas_kernels as pk, spec
    from cute_nucleotides_tpu.utils import profiling

    rng = np.random.default_rng(0xD5CA)
    rows = 64 if selftest else 8192
    nt = rows * pk.B5_ROW_NT
    host = rng.choice(
        np.frombuffer(b"ACGTUNacgtun", np.uint8), size=(rows, pk.B5_ROW_NT)
    )
    w64 = oracle.n_to_bits2_lut(host.reshape(-1))
    inter = np.ascontiguousarray(
        spec.u64_to_u32_pairs(w64).reshape(rows, 2 * pk.B5_ROW_WORDS)
    )
    nchk = min(rows, 1024)
    ref_small = oracle.bits_to_n2_lut(w64, nt)[: nchk * pk.B5_ROW_NT]

    def make_decoder(mode: str):
        """mode: shipped | dense | q8_dense | q8_tpad | halves | pairs."""
        dense = mode in ("dense", "q8_dense", "halves", "pairs")
        gather = build_gather_dense(pk) if dense else pk._b5_dec_gather_fold_bf16()
        if mode == "shipped":
            scatter = pk._b5_dec_scatter_quads_i8()
        elif mode == "dense":
            scatter = build_scatter_quads_dense(pk)
        elif mode in ("q8_dense", "q8_tpad"):
            scatter = build_scatter_q8(pk, dense)
        elif mode == "halves":
            scatter = build_scatter_halves(pk)
        elif mode == "pairs":
            scatter = build_scatter_pairs_i8(pk)
        else:
            raise ValueError(mode)
        tw = gather.shape[1]  # t cols per slice: 144 dense / 256 tpad

        def kernel(x_ref, g_ref, s_ref, o_ref):
            x = x_ref[:]
            rb = x.shape[0]
            m8 = jnp.uint32(0xFF)
            p0 = (x & m8).astype(jnp.int32).astype(jnp.bfloat16)
            p1 = ((x >> 8) & m8).astype(jnp.int32).astype(jnp.bfloat16)
            p2 = ((x >> 16) & m8).astype(jnp.int32).astype(jnp.bfloat16)
            p3 = (x >> 24).astype(jnp.int32).astype(jnp.bfloat16)
            for g in range(pk.B5_SLICES):
                planes = jnp.concatenate(
                    [
                        jax.lax.slice(p, (0, 32 * g), (rb, 32 * (g + 1)))
                        for p in (p0, p1, p2, p3)
                    ],
                    axis=1,
                )
                z = jnp.dot(planes, g_ref[:], preferred_element_type=jnp.float32)
                t = (z.astype(jnp.int32) >> 7) & 0x7F
                q5 = (t * 205) >> 10
                q25 = (t * 41) >> 10
                if mode in ("shipped", "dense"):
                    digs = jnp.concatenate(
                        [t - 5 * q5, q5 - 5 * q25, q25], axis=1
                    ).astype(jnp.int8)
                    v = jnp.dot(digs, s_ref[:], preferred_element_type=jnp.int32)
                    v5 = (v * 205) >> 10
                    v25 = (v * 41) >> 10
                    v125 = (v25 * 205) >> 10
                    pd = (
                        v + 251 * v5 + 64256 * v25 + 16449536 * v125
                    ).astype(jnp.uint32)
                elif mode in ("q8_dense", "q8_tpad"):
                    tq = jnp.concatenate([t, q5, q25], axis=1).astype(
                        jnp.bfloat16
                    )
                    v8 = jnp.dot(
                        tq, s_ref[:], preferred_element_type=jnp.float32
                    ).astype(jnp.int32)
                    pd = (
                        (v8 & 7)
                        | ((v8 & 0x38) << 5)
                        | ((v8 & 0x1C0) << 10)
                        | ((v8 & 0xE00) << 15)
                    ).astype(jnp.uint32)
                elif mode == "halves":
                    tq = jnp.concatenate([t, q5, q25], axis=1).astype(
                        jnp.bfloat16
                    )
                    h = jnp.dot(
                        tq, s_ref[:], preferred_element_type=jnp.float32
                    ).astype(jnp.int32)
                    lo = jax.lax.slice(h, (0, 0), (rb, 128))
                    hi = jax.lax.slice(h, (0, 128), (rb, 256))
                    pd = (lo | (hi << 16)).astype(jnp.uint32)
                else:  # pairs
                    tq = jnp.concatenate([t, q5, q25], axis=1).astype(jnp.int8)
                    h = jnp.dot(tq, s_ref[:], preferred_element_type=jnp.int32)
                    lo = jax.lax.slice(h, (0, 0), (rb, 128))
                    hi = jax.lax.slice(h, (0, 128), (rb, 256))
                    pd = (
                        (lo & 7)
                        | ((lo >> 3) << 8)
                        | ((hi & 7) << 16)
                        | ((hi >> 3) << 24)
                    ).astype(jnp.uint32)
                o_ref[:, 112 * g : 112 * (g + 1)] = pk._swar_digits_to_chars(
                    jax.lax.slice(pd, (0, 0), (rb, 112))
                )

        mats = (gather, scatter)

        def decode(words):
            mat_specs = [
                pl.BlockSpec(
                    m.shape, lambda i: (0,) * m.ndim, memory_space=pltpu.VMEM
                )
                for m in mats
            ]
            R = words.shape[0]
            rb = pk._row_block8(R, 512)
            return pl.pallas_call(
                kernel,
                grid=(pk._cdiv(R, rb),),
                in_specs=[
                    pl.BlockSpec(
                        (rb, 2 * pk.B5_ROW_WORDS),
                        lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    *mat_specs,
                ],
                out_specs=pl.BlockSpec(
                    (rb, pk.B5_NT4_PAD_LANES),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (R, pk.B5_NT4_PAD_LANES), jnp.uint32
                ),
                interpret=pk._auto_interpret(False),
            )(words, *mats)

        return decode

    def chained(fn):
        def step(s):
            r = fn(s)
            patch = r.ravel()[0].astype(s.dtype).reshape((1,) * s.ndim)
            return jax.lax.dynamic_update_slice(s, patch, (0,) * s.ndim), r

        return jax.jit(step, donate_argnums=0)

    def check(name, fn):
        got = np.asarray(jax.jit(fn)(jnp.asarray(inter[:nchk])))
        dec = pk.depad_nt4_host(got)
        if not np.array_equal(dec, ref_small):
            bad = int(np.flatnonzero(dec != ref_small)[0])
            print(
                f"{name:28s} WRONG (first diff at nt {bad}: "
                f"{dec[bad]!r} != {ref_small[bad]!r}) — skipped",
                flush=True,
            )
            return False
        print(f"{name:28s} bit-exact", flush=True)
        return True

    def measure(name, fn):
        step = chained(fn)
        state = jnp.asarray(inter)
        state, r = step(state)
        np.asarray(r.ravel()[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/tune_dec_sc/{name}"
        )
        if dt is None:
            print(f"{name:28s} NO PROFILE", flush=True)
            return None
        gibs = nt / dt / 2**30
        print(f"{name:28s} {dt * 1e3:8.3f} ms  {gibs:8.2f} GiB/s", flush=True)
        return gibs

    modes = ["shipped", "dense", "q8_dense", "q8_tpad", "halves", "pairs"]
    fns = {}
    for mode in modes:
        fn = make_decoder(mode)
        if check(mode, fn):
            fns[mode] = fn
    if selftest:
        ok = len(fns) == len(modes)
        print("selftest", "PASS" if ok else "FAIL", flush=True)
        return 0 if ok else 1
    print("--- all correct variants measured, 2 reps ---", flush=True)
    res = {}
    for rep in range(2):
        for name, fn in fns.items():
            g = measure(f"{name}#{rep}", fn)
            if g:
                res.setdefault(name, []).append(g)
    base = max(res.get("shipped", [0]))
    print("--- best-of-2 vs shipped ---", flush=True)
    for name, gs in sorted(res.items(), key=lambda kv: -max(kv[1])):
        rel = f"{(max(gs) / base - 1) * 100:+6.1f}%" if base else "  n/a"
        print(f"{name:28s} {max(gs):8.2f} GiB/s  {rel}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
