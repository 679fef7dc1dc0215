"""On-TPU A/B for decode_b5 stage-overlap variants (round 5).

The r04 stage ablation (docs/DESIGN.md §4) attributed the interleaved
decoder's 2x residual to NEAR-SERIAL stage execution: gather matmul 64% /
int8 scatter +20% / SWAR chars +14%, each slice's scatter waiting on its
gather and chars on its scatter.  These variants restructure the slice
loop so independent stages of DIFFERENT slices are adjacent in the
instruction stream, giving Mosaic's scheduler overlap to exploit:

  SKEW   software-pipelined loop: slice g+1's gather matmul (+ t/digit
         VPU work) is emitted BEFORE slice g's scatter + chars, so the
         MXU gather of g+1 can run under the VPU tail of g
  SKEWZ  same skew but only the gather DOT is hoisted ahead (the t/digit
         work stays with the consumer stage)
  SKEW2  two-deep skew (gathers run two slices ahead)
  2PH    two phases: all 8 gathers -> buffered int8 digit arrays, then
         all 8 scatter+chars passes (consecutive scatters independent)
  DIG    digit-domain output (lever (b)): emit the packed-digit u32
         lanes (pd) and SKIP the SWAR char conversion — the nt4 trick
         one level deeper; consumers (gc/revcomp/translate) take digits
  SKEWDIG  SKEW + DIG combined

Same-process profiler device durations only (docs/DESIGN.md §7).

    PYTHONPATH=.:/root/.axon_site timeout 1800 python tools/tune_dec_pipe.py
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cute_nucleotides_tpu.ops import oracle, pallas_kernels as pk, spec
    from cute_nucleotides_tpu.utils import profiling

    rng = np.random.default_rng(0xDEC5)
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nt = rows * pk.B5_ROW_NT
    host = rng.choice(
        np.frombuffer(b"ACGTUNacgtun", np.uint8), size=(rows, pk.B5_ROW_NT)
    )
    w64 = oracle.n_to_bits2_lut(host.reshape(-1))
    inter = np.ascontiguousarray(
        spec.u64_to_u32_pairs(w64).reshape(rows, 2 * pk.B5_ROW_WORDS)
    )
    ref_small = oracle.bits_to_n2_lut(w64, nt)[: 1024 * pk.B5_ROW_NT]
    # digit-domain reference: same bytes, chars -> digits
    dig_lut = np.zeros(256, np.uint8)
    for ch, d in zip(b"ACTGN", range(5)):
        dig_lut[ch] = d
    ref_small_dig = dig_lut[ref_small]

    def make_decoder(mode="base", digits=False, row_block=512):
        def kernel(x_ref, g_ref, s_ref, o_ref):
            x = x_ref[:]
            rb = x.shape[0]
            m8 = jnp.uint32(0xFF)
            p0 = (x & m8).astype(jnp.int32).astype(jnp.bfloat16)
            p1 = ((x >> 8) & m8).astype(jnp.int32).astype(jnp.bfloat16)
            p2 = ((x >> 16) & m8).astype(jnp.int32).astype(jnp.bfloat16)
            p3 = (x >> 24).astype(jnp.int32).astype(jnp.bfloat16)

            def planes(g):
                return jnp.concatenate(
                    [
                        jax.lax.slice(p, (0, 32 * g), (rb, 32 * (g + 1)))
                        for p in (p0, p1, p2, p3)
                    ],
                    axis=1,
                )

            def gather_dot(g):
                return jnp.dot(
                    planes(g), g_ref[:], preferred_element_type=jnp.float32
                )

            def z_to_digs(z):
                t = (z.astype(jnp.int32) >> 7) & 0x7F
                q5 = (t * 205) >> 10
                q25 = (t * 41) >> 10
                return jnp.concatenate(
                    [t - 5 * q5, q5 - 5 * q25, q25], axis=1
                ).astype(jnp.int8)

            def digs_to_out(digs):
                v = jnp.dot(digs, s_ref[:], preferred_element_type=jnp.int32)
                v5 = (v * 205) >> 10
                v25 = (v * 41) >> 10
                v125 = (v25 * 205) >> 10
                pd = (
                    v + 251 * v5 + 64256 * v25 + 16449536 * v125
                ).astype(jnp.uint32)
                pd = jax.lax.slice(pd, (0, 0), (rb, 112))
                return pd if digits else pk._swar_digits_to_chars(pd)

            def store(g, res):
                o_ref[:, 112 * g : 112 * (g + 1)] = res

            S = pk.B5_SLICES
            if mode == "base":
                for g in range(S):
                    store(g, digs_to_out(z_to_digs(gather_dot(g))))
            elif mode == "skew":
                d_prev = z_to_digs(gather_dot(0))
                for g in range(S):
                    d_next = z_to_digs(gather_dot(g + 1)) if g + 1 < S else None
                    store(g, digs_to_out(d_prev))
                    d_prev = d_next
            elif mode == "skewz":
                z_prev = gather_dot(0)
                for g in range(S):
                    z_next = gather_dot(g + 1) if g + 1 < S else None
                    store(g, digs_to_out(z_to_digs(z_prev)))
                    z_prev = z_next
            elif mode == "skew2":
                zs = [gather_dot(0), gather_dot(1)]
                for g in range(S):
                    if g + 2 < S:
                        zs.append(gather_dot(g + 2))
                    store(g, digs_to_out(z_to_digs(zs[g])))
            elif mode == "2ph":
                digs = [z_to_digs(gather_dot(g)) for g in range(S)]
                for g in range(S):
                    store(g, digs_to_out(digs[g]))
            elif mode == "2phz":
                zs = [gather_dot(g) for g in range(S)]
                for g in range(S):
                    store(g, digs_to_out(z_to_digs(zs[g])))
            else:
                raise ValueError(mode)

        def decode(words):
            mats = (pk._b5_dec_gather_fold_bf16(), pk._b5_dec_scatter_quads_i8())
            mat_specs = [
                pl.BlockSpec(m.shape, lambda i: (0,) * m.ndim, memory_space=pltpu.VMEM)
                for m in mats
            ]
            R = words.shape[0]
            rb = pk._row_block8(R, row_block)
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

    def check(name, fn, digits):
        got = np.asarray(jax.jit(fn)(jnp.asarray(inter[:1024])))
        dec = pk.depad_nt4_host(got)
        ref = ref_small_dig if digits else ref_small
        if not np.array_equal(dec, ref):
            print(f"{name:28s} WRONG ON HARDWARE — skipped", flush=True)
            return False
        return True

    def measure(name, fn):
        step = chained(fn)
        state = jnp.asarray(inter)
        state, r = step(state)
        np.asarray(r.ravel()[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/tune_dec_pipe/{name}"
        )
        if dt is None:
            print(f"{name:28s} NO PROFILE", flush=True)
            return None
        gibs = nt / dt / 2**30
        print(f"{name:28s} {dt * 1e3:8.3f} ms  {gibs:8.2f} GiB/s", flush=True)
        return gibs

    if len(sys.argv) > 2 and sys.argv[2] == "scale":
        # bench-scale confirmation pass: small-scale winners only
        variants = {
            "V0_shipped": dict(mode="base"),
            "VSKEW": dict(mode="skew"),
            "V2PH": dict(mode="2ph"),
            "V2PHZ": dict(mode="2phz"),
            "VDIG": dict(mode="base", digits=True),
            "VSKEWDIG": dict(mode="skew", digits=True),
            "V2PHDIG": dict(mode="2ph", digits=True),
        }
    else:
        variants = {
            "V0_shipped": dict(mode="base"),
            "VSKEW": dict(mode="skew"),
            "VSKEWZ": dict(mode="skewz"),
            "VSKEW2": dict(mode="skew2"),
            "V2PH": dict(mode="2ph"),
            "V2PH_rb256": dict(mode="2ph", row_block=256),
            "VDIG": dict(mode="base", digits=True),
            "VSKEWDIG": dict(mode="skew", digits=True),
        }
    fns = {}
    for name, kw in variants.items():
        fn = make_decoder(**kw)
        if check(name, fn, kw.get("digits", False)):
            fns[name] = fn
    print("--- all correct variants measured, 2 reps ---", flush=True)
    res = {}
    for rep in range(2):
        for name, fn in fns.items():
            g = measure(f"{name}#{rep}", fn)
            if g:
                res.setdefault(name, []).append(g)
    base = max(res.get("V0_shipped", [0]))
    print("--- best-of-2 vs shipped ---", flush=True)
    for name, gs in sorted(res.items(), key=lambda kv: -max(kv[1])):
        print(
            f"{name:28s} {max(gs):8.2f} GiB/s  {(max(gs) / base - 1) * 100:+6.1f}%",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
