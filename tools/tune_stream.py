"""Streaming-pipeline attribution + knob sweep on the real device.

Sweeps batch size x (prefetch_depth, readback_depth) over the same synthetic
FASTQ workload bench.py's stream rows use, printing one JSON line per
configuration with throughput AND the per-stage breakdown
(runtime._new_stages) so the ~400 ms/batch of BENCH_r03 is attributed:
prep_wait (host parse visible), dispatch (synchronous H2D slice),
backpressure (D2H/sink behind), vs the link floor from tools/link_probe.py.

Usage: PYTHONPATH=.:/root/.axon_site python tools/tune_stream.py
       [--reads 32768] [--len 2048] [--batches 4096,16384,32768]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def make_fastq(path: str, n_reads: int, read_len: int) -> None:
    rng = np.random.default_rng(0xC0DEC)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    sq = rng.choice(alphabet, size=(n_reads, read_len))
    q = b"I" * read_len
    with open(path, "wb") as f:
        parts = []
        for i in range(n_reads):
            parts.append(b"@r%d\n" % i + sq[i].tobytes() + b"\n+\n" + q + b"\n")
            if len(parts) == 4096:
                f.write(b"".join(parts))
                parts = []
        f.write(b"".join(parts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=32768)
    ap.add_argument("--len", dest="read_len", type=int, default=2048)
    ap.add_argument("--batches", default="4096,8192,16384,32768")
    ap.add_argument("--depths", default="1:1,2:2,4:4")
    args = ap.parse_args()

    from cute_nucleotides_tpu.parallel import runtime as rt
    from cute_nucleotides_tpu.utils import io as io_lib

    fq = "/dev/shm/cn_tune_stream.fastq"
    make_fastq(fq, args.reads, args.read_len)
    nt = args.reads * args.read_len
    print(
        f"workload: {args.reads} reads x {args.read_len} nt = "
        f"{nt / 1e6:.0f} Mnt ({nt / 2**20:.0f} MiB ASCII)",
        file=sys.stderr,
    )

    rows = []
    for bs in [int(b) for b in args.batches.split(",")]:
        for depths in args.depths.split(","):
            pd, rd = (int(d) for d in depths.split(":"))
            enc = rt.StreamingEncoder(
                batch_size=bs,
                max_len=args.read_len,
                prefetch_depth=pd,
                readback_depth=rd,
            )
            # warm the executable for this batch shape outside the timer
            warm = np.full((bs, args.read_len), ord("A"), np.uint8)
            np.asarray(enc.sharded.encode(enc.sharded.shard(warm)))
            sunk = [0]
            t0 = time.perf_counter()
            agg = enc.run_batches(
                io_lib.fastq_batches(fq, bs, args.read_len),
                lambda w, b: sunk.__setitem__(0, sunk[0] + w.nbytes),
            )
            dt = time.perf_counter() - t0
            row = {
                "batch_size": bs,
                "prefetch_depth": pd,
                "readback_depth": rd,
                "gbp_s": round(nt / dt / 1e9, 4),
                "reads_per_s": round(args.reads / dt, 1),
                "wall_s": round(dt, 3),
                "ms_per_batch": round(dt * 1e3 * bs / args.reads, 1),
                "sunk_mib": round(sunk[0] / 2**20, 1),
                "stages": agg.get("stages", {}),
            }
            rows.append(row)
            print(json.dumps(row), file=sys.stderr)
    best = max(rows, key=lambda r: r["gbp_s"])
    print(json.dumps({"rows": rows, "best": best}))


if __name__ == "__main__":
    main()
