"""On-TPU A/B: two-phase restructure of the base-5 encoder (round 5 #9).

The r05 decode restructure (tools/tune_dec_pipe.py) won +11/+36% by
making consecutive MXU matmuls adjacent in the instruction stream; the
encoder has the same shape (2 g-chunk matmuls per row block, each
followed by VPU parity-select + store).  VERDICT r04 #9 asks whether the
same slice-overlap machinery moves the encoder off its measured ~71% of
bf16 MXU roofline.  Variants: shipped (serial), 2PH (both dots first),
and a digit-hoist check (digits computed once — already shipped).

    PYTHONPATH=.:/root/.axon_site timeout 1800 python tools/tune_enc_pipe.py
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cute_nucleotides_tpu.ops import pallas_kernels as pk, spec
    from cute_nucleotides_tpu.utils import profiling

    rng = np.random.default_rng(0xE5C5)
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 77824
    host = rng.choice(
        np.frombuffer(b"ACGTUNacgtun", np.uint8), size=(rows, pk.B5_ROW_NT)
    )
    nt = rows * pk.B5_ROW_NT

    def make_encoder(mode="base", row_block=256):
        G = pk.B5_ROW_NT // pk.B5_ENC_GRP_NT

        def kernel(x_ref, m_ref, o_ref):
            x = x_ref[:].astype(jnp.int32)
            sh = (x & 7) << 2
            digits = (jnp.int32(spec.DIGIT_LUT8_U32) >> sh) & 0xF
            rb = digits.shape[0]
            odd = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (rb, pk.B5_ENC_GRP_U32), 1
                )
                & 1
            ) == 1

            def dot(g):
                d = jax.lax.slice(
                    digits,
                    (0, pk.B5_ENC_GRP_NT * g),
                    (rb, pk.B5_ENC_GRP_NT * (g + 1)),
                ).astype(jnp.bfloat16)
                return jnp.dot(
                    d, m_ref[:], preferred_element_type=jnp.float32
                )

            def store(g, zf):
                z = zf.astype(jnp.int32).astype(jnp.uint32)
                p = jax.lax.slice(z, (0, 0), (rb, pk.B5_ENC_GRP_U32))
                q = jax.lax.slice(
                    z, (0, pk.B5_ENC_GRP_U32), (rb, 2 * pk.B5_ENC_GRP_U32)
                )
                o_ref[
                    :, pk.B5_ENC_GRP_U32 * g : pk.B5_ENC_GRP_U32 * (g + 1)
                ] = jnp.where(
                    odd,
                    (p >> 11) | (q << 10),
                    p | ((q & jnp.uint32(0x7FF)) << 21),
                )

            if mode == "base":
                for g in range(G):
                    store(g, dot(g))
            elif mode == "2ph":
                zs = [dot(g) for g in range(G)]
                for g in range(G):
                    store(g, zs[g])
            else:
                raise ValueError(mode)

        def encode(x):
            m = pk._b5_enc_mat_inter()
            R = x.shape[0]
            rb = pk._row_block8(R, row_block)
            return pl.pallas_call(
                kernel,
                grid=(pk._cdiv(R, rb),),
                in_specs=[
                    pl.BlockSpec(
                        (rb, pk.B5_ROW_NT),
                        lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (rb, pk.B5_ROW_U32), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (R, pk.B5_ROW_U32), jnp.uint32
                ),
                interpret=pk._auto_interpret(False),
            )(x, m)

        return encode

    ref = np.asarray(
        jax.jit(pk.encode_b5_panels_v2)(jnp.asarray(host[:512]))
    )

    def chained(fn):
        def step(s):
            r = fn(s)
            patch = r.ravel()[0].astype(s.dtype).reshape((1,) * s.ndim)
            return jax.lax.dynamic_update_slice(s, patch, (0,) * s.ndim), r

        return jax.jit(step, donate_argnums=0)

    def measure(name, fn):
        got = np.asarray(jax.jit(fn)(jnp.asarray(host[:512])))
        if not np.array_equal(got, ref):
            print(f"{name:24s} WRONG — skipped", flush=True)
            return
        step = chained(fn)
        state = jnp.asarray(host)
        state, r = step(state)
        np.asarray(r.ravel()[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/tune_enc_pipe/{name}"
        )
        if dt is None:
            print(f"{name:24s} NO PROFILE", flush=True)
            return
        print(
            f"{name:24s} {dt * 1e3:8.3f} ms  {nt / dt / 2**30:8.2f} GiB/s",
            flush=True,
        )

    for rep in range(2):
        measure(f"V0_shipped#{rep}", pk.encode_b5_panels_v2)
        measure(f"VBASE_rb512#{rep}", make_encoder("base", row_block=512))
        measure(f"V2PH_rb512#{rep}", make_encoder("2ph", row_block=512))
    return 0


if __name__ == "__main__":
    sys.exit(main())
