"""On-TPU A/B measurement for the base-5 kernel variants (round 3 work).

Same-process back-to-back comparisons via profiler device durations (the
only methodology that supports optimization conclusions through the relay —
see docs/DESIGN.md §7): the interleaved decode with the quad scatter vs the
r02 half-pair scatter, and the checked encode with the slot-LUT check vs
the unchecked encode (the tax).

    PYTHONPATH=.:/root/.axon_site python tools/tune_b5.py
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

    rng = np.random.default_rng(0xB5)
    rows = 8192  # 28.3 Mnt
    nt = rows * pk.B5_ROW_NT
    host = rng.choice(
        np.frombuffer(b"ACGTUNacgtun", np.uint8), size=(rows, pk.B5_ROW_NT)
    )
    w64 = oracle.n_to_bits2_lut(host.reshape(-1))
    inter = np.ascontiguousarray(
        spec.u64_to_u32_pairs(w64).reshape(rows, 2 * pk.B5_ROW_WORDS)
    )

    def chained(fn):
        def step(s):
            r = fn(s)
            patch = r.ravel()[0].astype(s.dtype).reshape((1,) * s.ndim)
            return jax.lax.dynamic_update_slice(s, patch, (0,) * s.ndim), r

        return jax.jit(step, donate_argnums=0)

    def measure(name, fn, x, denom_nt=nt):
        step = chained(fn)
        state = jnp.asarray(x)
        state, r = step(state)  # compile + warm
        np.asarray(r.ravel()[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/tune_b5/{name}"
        )
        if dt is None:
            print(f"{name:34s} NO PROFILE", flush=True)
            return None
        gibs = denom_nt / dt / 2**30
        print(f"{name:34s} {dt * 1e3:8.3f} ms  {gibs:8.2f} GiB/s", flush=True)
        return gibs

    # pairs-scatter r02 variant of the interleaved decoder, rebuilt inline
    # (matrices included — the shipped kernel moved to the folded bf16
    # gather + quad scatter) so both forms live in one process
    import functools

    @functools.lru_cache(maxsize=None)
    def gather_bytes_i8():
        """r02 int8 byte-copy gather (see git history of pallas_kernels)."""
        g = np.zeros((128, 512), np.int8)
        for w in range(pk.B5_SLICE_WORDS):
            for j in range(9):
                k = (7 * j) // 8
                g[32 * (k % 4) + 2 * w + (1 if k >= 4 else 0), pk.B5_TPAD * w + j] = 1
                if (7 * j) % 8 > 0:
                    k1 = k + 1
                    g[
                        32 * (k1 % 4) + 2 * w + (1 if k1 >= 4 else 0),
                        256 + pk.B5_TPAD * w + j,
                    ] = 1
        return g

    def byte_lane_consts(shape):
        j16 = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1) & 15
        r = jnp.zeros(shape, jnp.int32)
        for j in range(9):
            r = jnp.where(j16 == j, (7 * j) % 8, r)
        ca = jnp.where(j16 < 9, jnp.int32(128), jnp.int32(0))
        cb = jnp.where((j16 >= 1) & (j16 <= 8) & (r > 0), jnp.int32(128), jnp.int32(0))
        return r, ca, cb

    def decode_inter_pairs(words):
        mats = (gather_bytes_i8(), pk._b5_dec_scatter_pairs_i8())
        mat_specs = [
            pl.BlockSpec(m.shape, lambda i: (0,) * m.ndim, memory_space=pltpu.VMEM)
            for m in mats
        ]
        R = words.shape[0]
        rb = pk._row_block8(R, 256)

        def kernel(x_ref, g_ref, s_ref, o_ref):
            x = x_ref[:]
            rbk = x.shape[0]
            rvec, ca, cb = byte_lane_consts(
                (rbk, pk.B5_SLICE_WORDS * pk.B5_TPAD)
            )
            m8 = jnp.uint32(0xFF)
            for g in range(pk.B5_SLICES):
                xg = jax.lax.slice(x, (0, 32 * g), (rbk, 32 * (g + 1)))
                planes = jnp.concatenate(
                    [xg & m8, (xg >> 8) & m8, (xg >> 16) & m8, xg >> 24], axis=1
                ).astype(jnp.int32)
                xi = (planes - 128).astype(jnp.int8)
                z = jnp.dot(xi, g_ref[:], preferred_element_type=jnp.int32)
                a = jax.lax.slice(z, (0, 0), (rbk, 256)) + ca
                b = jax.lax.slice(z, (0, 256), (rbk, 512)) + cb
                t = ((a >> rvec) | (b << (8 - rvec))) & 0x7F
                q5 = (t * 205) >> 10
                q25 = (t * 41) >> 10
                digs = jnp.concatenate(
                    [t - 5 * q5, q5 - 5 * q25, q25], axis=1
                ).astype(jnp.int8)
                zv = jnp.dot(digs, s_ref[:], preferred_element_type=jnp.int32)
                hp = (zv & 7) | ((zv >> 3) << 8)
                pd = (
                    jax.lax.slice(hp, (0, 0), (rbk, 112))
                    | (jax.lax.slice(hp, (0, 128), (rbk, 240)) << 16)
                ).astype(jnp.uint32)
                o_ref[:, 112 * g : 112 * (g + 1)] = pk._swar_digits_to_chars(pd)

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
                (rb, pk.B5_NT4_PAD_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((R, pk.B5_NT4_PAD_LANES), jnp.uint32),
        )(words, *mats)

    # correctness on hardware first (quads vs oracle; 1k rows)
    small = inter[:1024]
    got = np.asarray(
        jax.jit(pk.decode_b5_interleaved_panels)(jnp.asarray(small))
    )
    want = host.reshape(-1)[: 1024 * pk.B5_ROW_NT]
    dec = pk.depad_nt4_host(got)
    ref = oracle.bits_to_n2_lut(w64, nt)[: 1024 * pk.B5_ROW_NT]
    assert np.array_equal(dec, ref), "quad decode wrong on hardware"
    print("quad decode bit-exact on hardware (1024 rows)", flush=True)

    r_pairs = measure("decode_inter_pairs(r02)", decode_inter_pairs, inter)
    r_quads = measure(
        "decode_inter_quads(new)",
        lambda x: pk.decode_b5_interleaved_panels(x),
        inter,
    )
    # rerun both to confirm ordering stability
    measure("decode_inter_pairs(rerun)", decode_inter_pairs, inter)
    measure(
        "decode_inter_quads(rerun)",
        lambda x: pk.decode_b5_interleaved_panels(x),
        inter,
    )

    enc_host = host
    r_enc = measure(
        "encode_b5_unchecked", lambda x: pk.encode_b5_panels_v2(x), enc_host
    )
    r_chk = measure(
        "encode_b5_checked(new)",
        lambda x: pk.encode_b5_panels_checked(x)[0],
        enc_host,
    )
    if r_enc and r_chk:
        print(f"checked-encode tax: {(1 - r_chk / r_enc) * 100:.1f}%", flush=True)
    if r_pairs and r_quads:
        print(f"quad vs pairs: {(r_quads / r_pairs - 1) * 100:+.1f}%", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
