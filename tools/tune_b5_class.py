"""On-TPU A/B: shared-tap lane-parity reducer vs the two-fold original.

``ops/seqops._b5_lane_parity_reduce`` drives the base-5 digit-class sums
(GC / N counts), the stream-integrity scan, and is the measured bound of
those rows (BENCH_DETAIL r03: gc_content_packed_b5 at 0.097 SoL — ALU
ops, not HBM).  The shared-tap rewrite folds FIVE triplets per lane
instead of nine (the odd lanes' offsets 3/10/17/24 are the even lanes'
0/7/14/21 applied to ``x >> 3``), and GC additionally drops the
remainder computations via the quotient-parity identity.  This measures
the committed ops against an inlined copy of the r02 two-fold
formulation on the bench row's workload shape.

    PYTHONPATH=.:/root/.axon_site timeout 1800 python tools/tune_b5_class.py
    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/tune_b5_class.py --selftest
"""

from __future__ import annotations

import sys

import numpy as np


def _old_reduce(words, per_triplet, combine, init):
    """The r02 two-fold formulation (verbatim semantics), kept here only
    as the A/B baseline."""
    import jax
    import jax.numpy as jnp

    m7 = jnp.uint32(0x7F)
    x = words
    nxt = jnp.concatenate(
        [x[..., 1:], jnp.zeros((*x.shape[:-1], 1), jnp.uint32)], axis=-1
    )

    def fold(ts):
        acc = init(x.shape)
        for t in ts:
            acc = combine(acc, per_triplet(t))
        return acc

    even = fold(
        [(x >> (7 * j)) & m7 for j in range(4)]
        + [((x >> 28) | (nxt << 4)) & m7]
    )
    odd = fold([(x >> s) & m7 for s in (3, 10, 17, 24)])
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where((lane & 1) == 0, even, odd)


def main() -> int:
    selftest = "--selftest" in sys.argv
    import jax
    import jax.numpy as jnp

    from cute_nucleotides_tpu.ops import oracle, seqops, spec
    from cute_nucleotides_tpu.utils import profiling

    rng = np.random.default_rng(0xB5C1A55)
    n_nt = 27 * (1 << 12 if selftest else 1 << 21)  # ~56 Mnt bench-class
    seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), n_nt)
    w_np = spec.u64_to_u32_pairs(oracle.n_to_bits2_lut(seq.tobytes()))
    x = jnp.asarray(np.ascontiguousarray(w_np).reshape(-1))

    def old_gc(w):
        def per_triplet(t):
            t = t.astype(jnp.int32)
            q5 = (t * 205) >> 10
            q25 = (t * 41) >> 10
            a, b, c = t - 5 * q5, q5 - 5 * q25, q25
            return (a & 1) + (b & 1) + (c & 1)

        acc = _old_reduce(
            w,
            per_triplet,
            combine=lambda a, v: a + v,
            init=lambda shape: jnp.zeros(shape, jnp.int32),
        )
        return jnp.sum(acc, axis=-1)

    variants = {
        "gc_old_twofold": jax.jit(old_gc),
        "gc_new_sharedtap": jax.jit(seqops.gc_content_packed_b5),
        "ncount_new": jax.jit(seqops.n_count_packed_b5),
        "invalid_new": jax.jit(seqops.first_invalid_word_b5),
    }

    want_gc = int(np.sum((seq == ord("C")) | (seq == ord("G"))))
    got_old = int(variants["gc_old_twofold"](x))
    got_new = int(variants["gc_new_sharedtap"](x))
    assert got_old == want_gc == got_new, (want_gc, got_old, got_new)
    assert int(variants["ncount_new"](x)) == int(np.sum(seq == ord("N")))
    assert int(variants["invalid_new"](x)) == -1
    print(f"correctness ok (gc={want_gc} over {n_nt} nt)")
    if selftest:
        return 0

    nbytes = x.nbytes
    for name, fn in variants.items():
        def step(s, fn=fn):
            r = fn(s)
            patch = (r.ravel()[0] & 1).astype(s.dtype).reshape((1,))
            return jax.lax.dynamic_update_slice(s, s[:1] ^ patch, (0,)), r

        np.asarray(step(x)[1])  # warm
        dt, _ = profiling.measure_chained_device_seconds(
            step, x, iters=6, log_dir=f"/tmp/cn_prof/tune_b5_class_{name}"
        )
        if dt is None:
            print(f"{name:22s} profiler returned no duration")
            continue
        print(f"{name:22s} {dt * 1e3:8.3f} ms   {nbytes / dt / 2**30:8.2f} GiB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
