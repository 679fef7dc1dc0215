"""Hardware probes for the sort rework (round 5): which Mosaic
primitive removes the bitonic's XLA-transpose wall?

The v1 layout-switching sort measured 10.3 ms vs lax.sort's 9.8 at 2^22
— the 44 XLA transposes between kernel passes ate the entire stage-op
advantage.  Two candidate in-kernel replacements, each probed for
correctness + device time at realistic shape (2048 x 2048 i32):

  T   in-kernel transpose: K1 reads an X lane strip (2048, 128) and
      writes it as a Y row block (128, 2048) via `x.T` + a transposed
      out BlockSpec — the transpose rides the kernel pass.
  R   lane rotation: a stage at lane stride j via two pltpu.roll calls
      and a select — no transpose at all; 11-stage chain timed.

    PYTHONPATH=.:/root/.axon_site timeout 1800 python tools/probe_mosaic.py
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

    rng = np.random.default_rng(1)
    N = 2048
    x = rng.integers(-(2**31), 2**31, (N, N), dtype=np.int64).astype(
        np.int32
    )
    xd = jnp.asarray(x)

    # --- T: in-kernel transpose, strip -> row block ---
    def t_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    def t_call(v):
        return pl.pallas_call(
            t_kernel,
            grid=(N // 128,),
            in_specs=[
                pl.BlockSpec(
                    (N, 128), lambda i: (0, i), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (128, N), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N, N), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024
            ),
            interpret=pk._auto_interpret(False),
        )(v)

    # --- R: 11-stage lane-roll compare-exchange chain on row blocks ---
    def r_kernel(x_ref, o_ref):
        v = x_ref[:]
        rb, C = v.shape
        c = jax.lax.broadcasted_iota(jnp.int32, (rb, C), 1)
        for jl in range(10, -1, -1):
            j = 1 << jl
            up = (c & j) == 0
            p = jnp.where(
                up, pltpu.roll(v, -j, 1), pltpu.roll(v, j, 1)
            )
            take = (v > p) == up  # asc everywhere (probe only)
            v = jnp.where(take, p, v)
        o_ref[:] = v

    def r_call(v):
        rb = 256
        return pl.pallas_call(
            r_kernel,
            grid=(N // rb,),
            in_specs=[
                pl.BlockSpec(
                    (rb, N), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (rb, N), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N, N), jnp.int32),
            interpret=pk._auto_interpret(False),
        )(v)

    # --- baseline: plain XLA transpose at the same shape ---
    def xla_t(v):
        return v.T + 1  # +1 defeats a no-op layout elision

    def measure(name, fn, *args):
        f = jax.jit(fn)
        r = f(*args)
        np.asarray(np.asarray(r).ravel()[:4])
        dt = profiling.measure_device_seconds(
            f, *args, iters=8, log_dir=f"/tmp/probe_mosaic/{name}"
        )
        if dt is None:
            print(f"{name:20s} NO PROFILE", flush=True)
            return
        mb = x.nbytes * 2 / 2**20
        print(
            f"{name:20s} {dt * 1e6:9.1f} us  ({mb / dt / 1024:7.1f} GiB/s r+w)",
            flush=True,
        )

    # correctness first
    try:
        got = np.asarray(jax.jit(t_call)(xd))
        ok = np.array_equal(got, x.T)
        print(f"T transpose kernel: {'OK' if ok else 'WRONG'}", flush=True)
        t_ok = ok
    except Exception as e:
        print(f"T transpose kernel: FAILED ({type(e).__name__}) {e}"[:300], flush=True)
        t_ok = False
    try:
        got = np.asarray(jax.jit(r_call)(xd))
        # reference: the same network in numpy
        v = x.copy()
        c = np.arange(N)[None, :]
        for jl in range(10, -1, -1):
            j = 1 << jl
            up = (c & j) == 0
            p = np.where(up, np.roll(v, -j, 1), np.roll(v, j, 1))
            take = (v > p) == up
            v = np.where(take, p, v)
        ok = np.array_equal(got, v)
        print(f"R roll chain kernel: {'OK' if ok else 'WRONG'}", flush=True)
        r_ok = ok
    except Exception as e:
        print(f"R roll chain kernel: FAILED ({type(e).__name__}) {e}"[:300], flush=True)
        r_ok = False

    measure("xla_transpose", xla_t, xd)
    if t_ok:
        for rep in range(2):
            measure(f"kernel_T#{rep}", t_call, xd)
    if r_ok:
        for rep in range(2):
            measure(f"kernel_R_11stage#{rep}", r_call, xd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
