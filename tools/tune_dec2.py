"""On-TPU probe: is the 2-bit swar decode (0.78 SoL) VPU-limited or at its
layout floor?

The decode kernel is identity-lane (u8[R,C] packed -> u32[R,C] nt4): one
u8 load, a u8->u32 widen, ~15 VPU ops, one u32 store.  ``ceiling`` runs
the widen + store with NO unpack math — if it also lands at ~0.78 SoL the
kernel is at its layout floor (the widen/store traffic is the bound) and
no VPU trim can help; any gap is trimmable headroom.  ``mul15`` replaces
the ``e * 15`` with ``(e << 4) - e`` as the one candidate trim.

    PYTHONPATH=.:/root/.axon_site timeout 1800 python tools/tune_dec2.py
    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/tune_dec2.py --selftest
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    selftest = "--selftest" in sys.argv
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cute_nucleotides_tpu.ops import oracle, pallas_kernels as pk
    from cute_nucleotides_tpu.utils import profiling

    def make(mode: str):
        def kernel(x_ref, o_ref):
            b = x_ref[:].astype(jnp.int32).astype(jnp.uint32)
            if mode == "ceiling":
                o_ref[:] = b
                return
            m1 = (b & jnp.uint32(0x33)) * jnp.uint32(pk._SPREAD_MUL_02)
            m2 = (b & jnp.uint32(0xCC)) * jnp.uint32(pk._SPREAD_MUL_13)
            s = (m1 | m2) & jnp.uint32(0x03030303)
            e = (s >> 1) & (~s) & jnp.uint32(0x01010101)
            if mode == "mul15":
                o_ref[:] = jnp.uint32(0x41414141) + (s << 1) + ((e << 4) - e)
            else:
                o_ref[:] = (
                    jnp.uint32(0x41414141) + (s << 1) + e * jnp.uint32(15)
                )

        def run(p):
            R, C = p.shape
            rb = pk._row_block(C, 4 + 1, R)
            return pl.pallas_call(
                kernel,
                grid=(pk._cdiv(R, rb),),
                in_specs=[
                    pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
                ],
                out_specs=pl.BlockSpec(
                    (rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((R, C), jnp.uint32),
                interpret=pk._auto_interpret(False),
            )(p)

        return run

    rng = np.random.default_rng(0xDEC2)
    rows, cols = 4096, 8192  # 32 MiB packed -> 128 MiB nt4
    packed = rng.integers(0, 256, size=(rows, cols), dtype=np.uint8)

    # correctness vs the shipped variant (small slab)
    small = jnp.asarray(packed[:64])
    want = np.asarray(pk.decode_2bit_nt4(small))
    results = {}
    for mode in ("shipped", "mul15", "ceiling"):
        got = np.asarray(jax.jit(make(mode))(small))
        ok = mode == "ceiling" or np.array_equal(got, want)
        print(f"{mode:10s} {'bit-exact' if ok else 'WRONG'}", flush=True)
        results[mode] = ok
    if selftest:
        ok = all(results.values())
        print("selftest", "PASS" if ok else "FAIL", flush=True)
        return 0 if ok else 1

    def chained(fn):
        def step(s):
            r = fn(s)
            patch = (r.ravel()[0] & jnp.uint32(0xFF)).astype(jnp.uint8)
            return (
                jax.lax.dynamic_update_slice(s, patch.reshape((1, 1)), (0, 0)),
                r,
            )

        return jax.jit(step, donate_argnums=0)

    def measure(name, fn):
        step = chained(fn)
        state = jnp.asarray(packed)
        state, r = step(state)
        np.asarray(r.ravel()[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/tune_dec2/{name}"
        )
        if dt is None:
            print(f"{name:14s} NO PROFILE", flush=True)
            return None
        traffic = packed.size * 5  # 1 read + 4 write bytes per nt4 byte
        print(
            f"{name:14s} {dt * 1e3:8.3f} ms  {traffic / dt / 2**30:8.2f} GiB/s traffic",
            flush=True,
        )
        return dt

    print("--- 2 reps ---", flush=True)
    for rep in range(2):
        for mode in ("shipped", "mul15", "ceiling"):
            if results.get(mode):
                measure(f"{mode}#{rep}", make(mode))
    return 0


if __name__ == "__main__":
    sys.exit(main())
