"""On-TPU ablation for the 2-bit decoder's >256-row regression (round 5).

VERDICT r04 weak #7: `decode_2bit_pallas_swar` runs at 478 GiB/s (0.783
bytes-SoL) while the encoder reaches 0.891, and the comment at
pallas_kernels.py:62-64 records that the write-heavy decoder REGRESSES
past 256-row blocks without saying why.  This script attributes the
residual the r4 way (same-process profiler durations only):

  STORE   stage ablation: read the packed tile, store `b * 0x01010101`
          (one widening mul, no decode) — the pure 1B-in/4B-out DMA+issue
          floor at each tiling.  If STORE regresses past 256 rows too,
          the regression is a DMA/layout effect, not the SWAR compute.
  SWAR    the shipped kernel at each tiling (row blocks 128..1024, and
          column-tiled grids rb x cb)
  PAR     dimension_semantics=("parallel",) on the row grid
  HALF    two half-width stores per tile (splits the output DMA)

    PYTHONPATH=.:/root/.axon_site timeout 2400 python tools/tune_dec2_rows.py
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cute_nucleotides_tpu.ops import pallas_kernels as pk
    from cute_nucleotides_tpu.utils import profiling

    rng = np.random.default_rng(0xDEC2)
    R, C = 16384, 2048  # bench shape: 32768x8192nt -> packed u8[R=32768, 2048]
    R = int(sys.argv[1]) if len(sys.argv) > 1 else R
    packed = rng.integers(0, 256, (R, C), dtype=np.uint16).astype(np.uint8)
    ref = np.asarray(
        jax.jit(lambda p: pk.decode_2bit_nt4(p, "swar", interpret=True))(
            jnp.asarray(packed[:256])
        )
    )
    out_bytes = R * C * 4  # decoded-bytes denominator (bench convention)

    def swar_body(x_ref, o_ref):
        b = x_ref[:].astype(jnp.int32).astype(jnp.uint32)
        o_ref[:] = pk._unpack4_swar(b)

    def store_body(x_ref, o_ref):
        b = x_ref[:].astype(jnp.int32).astype(jnp.uint32)
        o_ref[:] = b * jnp.uint32(0x01010101)

    def half_body(x_ref, o_ref):
        b = x_ref[:].astype(jnp.int32).astype(jnp.uint32)
        v = pk._unpack4_swar(b)
        h = v.shape[1] // 2
        o_ref[:, :h] = jax.lax.slice(v, (0, 0), (v.shape[0], h))
        o_ref[:, h:] = jax.lax.slice(v, (0, h), v.shape)

    def make(body, rb, cb=None, parallel=False):
        cb = cb or C

        def fn(p):
            grid = (pk._cdiv(R, rb),) if cb == C else (
                pk._cdiv(R, rb), pk._cdiv(C, cb)
            )
            ix = (lambda i: (i, 0)) if cb == C else (lambda i, j: (i, j))
            params = {}
            if parallel:
                params["compiler_params"] = pltpu.CompilerParams(
                    dimension_semantics=("parallel",) * len(grid)
                )
            return pl.pallas_call(
                body,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((rb, cb), ix, memory_space=pltpu.VMEM)
                ],
                out_specs=pl.BlockSpec((rb, cb), ix, memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
                interpret=pk._auto_interpret(False),
                **params,
            )(p)

        return fn

    def chained(fn):
        def step(s):
            r = fn(s)
            patch = r.ravel()[0].astype(s.dtype).reshape((1,) * s.ndim)
            return jax.lax.dynamic_update_slice(s, patch, (0,) * s.ndim), r

        return jax.jit(step, donate_argnums=0)

    def measure(name, fn, check=False):
        if check:
            got = np.asarray(jax.jit(fn)(jnp.asarray(packed))[:256])
            if not np.array_equal(got, ref):
                print(f"{name:28s} WRONG ON HARDWARE — skipped", flush=True)
                return
        step = chained(fn)
        state = jnp.asarray(packed)
        state, r = step(state)
        np.asarray(r.ravel()[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/tune_dec2/{name}"
        )
        if dt is None:
            print(f"{name:28s} NO PROFILE", flush=True)
            return
        print(
            f"{name:28s} {dt * 1e3:8.3f} ms  {out_bytes / dt / 2**30:8.2f}"
            " GiB/s",
            flush=True,
        )

    # rb=1024 OOMs scoped VMEM (in 2M + out 8M, double-buffered = 20M)
    for rep in range(2):
        for rb in (128, 256, 384, 512):
            measure(f"STORE_rb{rb}#{rep}", make(store_body, rb))
        for rb in (128, 256, 384, 512):
            measure(f"SWAR_rb{rb}#{rep}", make(swar_body, rb), check=True)
        for rb, cb in ((256, 1024), (512, 1024), (512, 512), (1024, 512)):
            measure(
                f"SWAR_rb{rb}x{cb}#{rep}",
                make(swar_body, rb, cb),
                check=True,
            )
        measure(
            f"SWAR_rb256_par#{rep}", make(swar_body, 256, parallel=True),
            check=True,
        )
        measure(
            f"SWAR_rb512_par#{rep}", make(swar_body, 512, parallel=True),
            check=True,
        )
        measure(f"HALF_rb256#{rep}", make(half_body, 256), check=True)
        measure(f"HALF_rb512#{rep}", make(half_body, 512), check=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
