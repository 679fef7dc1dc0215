"""Pod-scale streaming benchmark: per-host and pod-wide Gbp/s + scaling.

The single-chip criterion analogue lives in bench.py; this runner measures
the BASELINE north-star distributed metrics — reads/s and Gbp/s at 1 host
and N hosts, with scaling efficiency vs linear — using the production
StreamingEncoder pipeline on synthetic reads (no input files needed).

Single process (dev boxes, CI):
    python tools/pod_bench.py --reads 100000 --read-len 2048

Real pod (one invocation per host; the TPU runtime auto-detects the
coordinator on Cloud TPU, or pass --coordinator host:port explicitly):
    python tools/pod_bench.py --num-processes N --process-id $ID \
        --coordinator $COORD --reads 1000000

Each host prints its aggregate JSON line; host 0 additionally prints the
pod-wide line with ``scaling_efficiency`` (pod reads/s over N x the measured
single-host rate when --single-host-rps is provided).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def synth_records(
    n: int,
    read_len: int,
    seed: int = 0,
    chunk: int = 4096,
    local_id: int = 0,
    nprocs: int = 1,
):
    """Synthetic read stream; generated in vectorized chunks so the
    generator never becomes the measured bottleneck (a per-read
    ``rng.choice`` caps the whole pipeline at ~30k reads/s of numpy).

    ``local_id``/``nprocs``: non-local records (the encoder drops them by
    index without reading their bytes) get one shared placeholder, so
    each host pays generation cost only for its own shard — matching a
    real pod, where every host reads its own file shard rather than
    synthesizing its neighbors'.
    """
    from cute_nucleotides_tpu.utils import io as io_lib

    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACGTN", np.uint8)
    placeholder = b"A" * read_len
    i = 0
    while i < n:
        m = min(chunk, n - i)
        mine = [r for r in range(m) if (i + r) % nprocs == local_id]
        block = rng.choice(alphabet, size=(len(mine), read_len))
        local = {r: j for j, r in enumerate(mine)}
        for r in range(m):
            j = local.get(r)
            seq = placeholder if j is None else block[j].tobytes()
            yield io_lib.Record(str(i + r).encode(), seq)
        i += m


def _collective_probe(reps: int = 20) -> dict:
    """Measured cross-process collective cost on the live pod/mesh: one
    barrier-synced timing of a tiny all_gather (latency) and a 4 MiB
    all_gather (bandwidth), in seconds per op.

    The streaming pipeline itself is collective-free across hosts (records
    are host-sharded), so this probe is the *attribution* term the scaling
    artifact needs: it bounds what a pod-wide merge (sketch union, stats
    psum) would add per batch, and separates 'collective overhead' from
    'host contention' in POD_SCALING.json — on the CPU-mesh harness the
    two are otherwise conflated in the efficiency number.
    """
    import time

    import numpy as np
    from jax.experimental import multihost_utils

    out = {}
    for name, n in (("latency_small", 64), ("gather_4MiB", 1 << 20)):
        local = np.ones(n, np.float32)
        multihost_utils.process_allgather(local)  # warmup + barrier
        t0 = time.perf_counter()
        for _ in range(reps):
            multihost_utils.process_allgather(local)
        out[f"{name}_s_per_op"] = round((time.perf_counter() - t0) / reps, 6)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reads", type=int, default=100_000)
    p.add_argument("--read-len", type=int, default=2048)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--codec", choices=["2bit", "base5"], default="2bit")
    p.add_argument("--tier", default="auto")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument(
        "--single-host-rps",
        type=float,
        default=None,
        help="measured 1-host reads/s, for scaling-efficiency reporting",
    )
    args = p.parse_args(argv)

    from cute_nucleotides_tpu.parallel import runtime
    from cute_nucleotides_tpu.utils import metrics

    info = runtime.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    print(json.dumps({"event": "topology", **info}), file=sys.stderr)

    # round the batch size to the local device count
    import jax

    n_local = len(jax.local_devices())
    batch = max(args.batch_size // n_local, 1) * n_local

    enc = runtime.StreamingEncoder(
        batch_size=batch,
        max_len=args.read_len,
        codec=args.codec,
        tier=args.tier,
        log_every=0,
    )
    agg = enc.run(
        synth_records(
            args.reads,
            args.read_len,
            local_id=info["process_index"],
            nprocs=info["process_count"],
        )
    )
    if info["process_count"] > 1:
        agg["collective"] = _collective_probe()
    agg["event"] = "host_aggregate"
    print(json.dumps(agg))

    if info["process_index"] == 0 and args.single_host_rps:
        eff = metrics.scaling_efficiency(
            args.single_host_rps, info["process_count"],
            agg["reads_per_s"] * info["process_count"],
        )
        print(
            json.dumps(
                {
                    "event": "pod_aggregate",
                    "hosts": info["process_count"],
                    "est_pod_reads_per_s": round(
                        agg["reads_per_s"] * info["process_count"], 1
                    ),
                    "scaling_efficiency": round(eff, 4),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
