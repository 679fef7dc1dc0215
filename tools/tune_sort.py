"""On-TPU A/B: layout-switching bitonic vs jax.lax.sort (round 5).

The DESIGN derivation ("kmer_counts is the platform sort primitive")
put lax.sort within ~2x of a full-network VPU floor; ops/sort.py now
implements that network with layout switching (no lane shuffles).  This
measures both on the kmer_counts key distribution at the bench shape,
plus kmer_counts end-to-end with each sort.

    PYTHONPATH=.:/root/.axon_site timeout 2400 python tools/tune_sort.py
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from cute_nucleotides_tpu.ops import sort
    from cute_nucleotides_tpu.utils import profiling

    rng = np.random.default_rng(0x5027)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    hi = rng.integers(0, 1 << 10, n, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    hi[-n // 64 :] = 0xFFFFFFFF
    lo[-n // 64 :] = 0xFFFFFFFF

    def lax_sort(h, l):
        return jax.lax.sort((h, l), num_keys=2)

    def bitonic(h, l):
        return sort._sort_pairs_bitonic(h, l)

    hd, ld = jnp.asarray(hi), jnp.asarray(lo)

    # correctness on hardware first
    got = [np.asarray(a) for a in jax.jit(bitonic)(hd, ld)]
    want = [np.asarray(a) for a in jax.jit(lax_sort)(hd, ld)]
    if not all(np.array_equal(g, w) for g, w in zip(got, want)):
        print("BITONIC WRONG ON HARDWARE", flush=True)
        return 1
    print("bitonic == lax.sort on hardware", flush=True)

    def measure(name, fn):
        f = jax.jit(fn)
        r = f(hd, ld)
        np.asarray(r[0].ravel()[:4])
        dt = profiling.measure_device_seconds(
            f, hd, ld, iters=6, log_dir=f"/tmp/tune_sort/{name}"
        )
        if dt is None:
            print(f"{name:24s} NO PROFILE", flush=True)
            return None
        rate = n / dt / 1e6
        print(
            f"{name:24s} {dt * 1e3:8.3f} ms  {rate:9.1f} Mpairs/s",
            flush=True,
        )
        return dt

    for rep in range(2):
        measure(f"lax_sort#{rep}", lax_sort)
        measure(f"bitonic#{rep}", bitonic)

    # kmer_counts end-to-end at the bench shape (4.2 Mnt, k=21)
    from cute_nucleotides_tpu.ops import kmer, oracle, spec

    nt = 1 << 22
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=nt)
    words = jnp.asarray(
        spec.u64_to_u32_pairs(oracle.n_to_bits_lut(seq)).reshape(-1)
    )

    def counts(w):
        return kmer.kmer_counts(w, nt, 21, canonical=True)

    f = jax.jit(counts)
    r = f(words)
    np.asarray(r[2].ravel()[:4])
    dt = profiling.measure_device_seconds(
        f, words, iters=6, log_dir="/tmp/tune_sort/kmer"
    )
    if dt is not None:
        gibs = nt / 4 / dt / 2**30
        print(
            f"{'kmer_counts_k21':24s} {dt * 1e3:8.3f} ms  {gibs:8.3f} GiB/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
