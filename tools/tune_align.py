"""On-TPU A/B: scan unroll + batch shape for the Myers edit-distance scan.

``ops/align._myers_scan`` is a ``lax.scan`` whose per-step body is ~40 VPU
lane-ops per 32-row block; the knobs XLA leaves us are the scan ``unroll``
factor (amortizes loop overhead, grows the fused body) and the batch size
per dispatch (lane occupancy vs state footprint).  Sweeps unroll 1/2
on the bench row's workload (B=8192 pairs, m=128, n=2048: 2.1 G DP cells)
and B 2048/8192/16384 at the winner.  Ships by changing the ``unroll=1``
default in ops/align.py if a variant wins by >= 3%.  (The scan is
word-native: one step already advances 16 columns.)

    PYTHONPATH=.:/root/.axon_site timeout 1800 python tools/tune_align.py
    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/tune_align.py --selftest
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    selftest = "--selftest" in sys.argv
    import jax
    import jax.numpy as jnp

    from cute_nucleotides_tpu.ops import align
    from cute_nucleotides_tpu.utils import profiling

    rng = np.random.default_rng(0xA116)
    # selftest shapes stay small: XLA-CPU's optimizer is superlinear in
    # the scan body (nb blocks x 16 unrolled columns x unroll)
    B = 64 if selftest else 8192
    m = 64 if selftest else 128
    n = 256 if selftest else 2048
    qw = rng.integers(0, 2**32, (B, m // 16), dtype=np.uint64).astype(
        np.uint32
    )
    tw = rng.integers(0, 2**32, (B, n // 16), dtype=np.uint64).astype(
        np.uint32
    )
    ql = np.full(B, m, np.int32)
    tl = np.full(B, n, np.int32)
    args = tuple(jnp.asarray(a) for a in (qw, ql, tw, tl))

    def fn_unroll(u):
        def fn(q):
            return align.edit_distance_packed(q, *args[1:], unroll=u)

        return fn

    # the scan body is already 16 chars per step (word-native); XLA's
    # optimizer is superlinear in inlined columns — unroll 4 at nb >= 2
    # already compiles for MINUTES (measured on CPU), so the sweep stops
    # at 2.  Variants gate+measure one at a time (below) so a slow
    # compile cannot eat an earlier variant's logged result.
    want = np.asarray(fn_unroll(1)(args[0]))
    ok_all = True
    variants = [(f"unroll{u}", fn_unroll(u), u) for u in (1, 2)]
    if selftest:
        for name, fn, _u in variants:
            got = np.asarray(fn(args[0]))
            ok = np.array_equal(got, want)
            ok_all &= ok
            print(f"{name:10s} {'bit-exact' if ok else 'WRONG'}", flush=True)
        # also pin one row against the DP oracle
        i = int(rng.integers(0, B))
        qs = np.zeros(m, np.uint8)
        for k in range(m):
            qs[k] = ord("ACTG"[(int(qw[i, k // 16]) >> (2 * (k % 16))) & 3])
        ts = np.zeros(n, np.uint8)
        for k in range(n):
            ts[k] = ord("ACTG"[(int(tw[i, k // 16]) >> (2 * (k % 16))) & 3])
        ok = want[i] == align.edit_distance_reference(bytes(qs), bytes(ts))
        ok_all &= bool(ok)
        print("dp-oracle row", "ok" if ok else "WRONG", flush=True)
        print("selftest", "PASS" if ok_all else "FAIL", flush=True)
        return 0 if ok_all else 1
    cells = B * m * n

    def chained(fn):
        def step(s):
            r = fn(s)
            patch = r[0:1].astype(jnp.uint32).reshape(1, 1)
            return jax.lax.dynamic_update_slice(s, patch, (0, 0)), r

        return jax.jit(step, donate_argnums=0)

    def measure(name, fn, state0):
        step = chained(fn)
        state = jnp.asarray(state0)
        state, r = step(state)
        np.asarray(r[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/tune_align/{name}"
        )
        if dt is None:
            print(f"{name:12s} NO PROFILE", flush=True)
            return None
        print(
            f"{name:12s} {dt * 1e3:8.3f} ms  "
            f"{cells / dt / 1e9:7.2f} Gcells/s",
            flush=True,
        )
        return dt

    best_u, best_dt = 1, None
    for name, fn, u in variants:
        got = np.asarray(fn(args[0]))  # bit-exact gate, per variant
        if not np.array_equal(got, want):
            print(f"{name:10s} WRONG — skipped", flush=True)
            continue
        print(f"{name:10s} bit-exact", flush=True)
        dt = measure(name, fn, qw)
        if dt is not None and (best_dt is None or dt < best_dt):
            best_u, best_dt = u, dt
    print(f"winner: unroll{best_u}", flush=True)

    # batch-size sweep at the winning unroll
    for Bv in (2048, 8192, 16384):
        qb = np.tile(qw, (max(1, -(-Bv // B)), 1))[:Bv]
        tb = jnp.asarray(np.tile(tw, (max(1, -(-Bv // B)), 1))[:Bv])
        qlb = jnp.full((Bv,), m, jnp.int32)
        tlb = jnp.full((Bv,), n, jnp.int32)

        def fnb(q, tb=tb, qlb=qlb, tlb=tlb, u=best_u):
            return align.edit_distance_packed(q, qlb, tb, tlb, unroll=u)

        step = chained(fnb)
        state = jnp.asarray(qb)
        state, r = step(state)
        np.asarray(r[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/tune_align/B{Bv}"
        )
        if dt is not None:
            print(
                f"B={Bv:<6d}   {dt * 1e3:8.3f} ms  "
                f"{Bv * m * n / dt / 1e9:7.2f} Gcells/s",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
