"""Commit-able multi-host scaling artifact: H=1 vs H=2 on the CPU runtime.

BASELINE.md's >= 90%-linear target is a pod claim; real multi-chip
hardware is not reachable from this environment, so this driver exercises
the *mechanics* of the claim on the same 2-process `jax.distributed` CPU
harness `tests/test_multihost.py` uses: it runs `tools/pod_bench.py`
(the production StreamingEncoder pipeline, host-sharded by record index)
once single-process and once as 2 coordinated processes, and writes
`POD_SCALING.json` at the repo root — clearly labeled `backend: cpu-mesh`
so nobody mistakes it for pod numbers.

CPU-mesh caveat, recorded in the artifact: both "hosts" share one
machine's cores, so the efficiency measures runtime/collective overhead
plus host CPU contention (a lower bound on the real-pod number, where
hosts do not share cores).

    python tools/pod_scaling.py --reads 20000 --read-len 2048
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _cpu_env() -> dict:
    env = {
        k: v
        for k, v in os.environ.items()
        # strip ambient TPU plugin/sitecustomize hooks (initialize JAX
        # backends at interpreter startup, before distributed init)
        if not (k.startswith(("AXON", "PALLAS_AXON", "TPU")) or k == "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root
    return env


def _run_host(args, proc_id=None, coord=None, nprocs=None):
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "pod_bench.py"),
        "--reads", str(args.reads),
        "--read-len", str(args.read_len),
        "--batch-size", str(args.batch_size),
        "--codec", args.codec,
        "--tier", "xla",
    ]
    if coord is not None:
        cmd += [
            "--coordinator", coord,
            "--num-processes", str(nprocs),
            "--process-id", str(proc_id),
        ]
    return subprocess.Popen(
        cmd, env=_cpu_env(), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
    )


def _host_aggregate(stdout: str) -> dict:
    for line in stdout.splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("event") == "host_aggregate":
            return d
    raise RuntimeError(f"no host_aggregate line in: {stdout[-500:]}")


def _stage_per_kread(agg: dict) -> dict:
    """Per-1000-reads seconds for each pipeline stage of one host run —
    the unit that makes H=1 and H=N runs directly comparable (they
    process different read counts)."""
    reads = max(agg.get("total_reads", 1), 1)
    return {
        k: 1000.0 * v / reads
        for k, v in agg.get("stages", {}).items()
        if k != "wall_s"
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reads", type=int, default=20_000)
    p.add_argument("--read-len", type=int, default=2048)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--codec", choices=["2bit", "base5"], default="2bit")
    p.add_argument("--trials", type=int, default=3)
    p.add_argument(
        "--hosts", type=int, default=2,
        help="number of coordinated jax.distributed processes (N >= 2)",
    )
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    H = max(args.hosts, 2)

    # H=1: best of `trials` (single-host rate is the efficiency denominator;
    # taking its max biases the efficiency DOWN — the conservative side)
    single = []
    for _ in range(args.trials):
        proc = _run_host(args)
        out, err = proc.communicate(timeout=1200)
        if proc.returncode != 0:
            print(err[-2000:], file=sys.stderr)
            return 1
        single.append(_host_aggregate(out))
    single_rps = max(s["reads_per_s"] for s in single)
    single_best = max(single, key=lambda s: s["reads_per_s"])

    # H=N: one coordinated run per trial; pod rate = total reads over the
    # slower host's wall clock (NOT the sum of per-host rates, which would
    # overcount when hosts finish at different times)
    pod_trials = []
    for _ in range(args.trials):
        coord = f"localhost:{_free_port()}"
        procs = [_run_host(args, i, coord, H) for i in range(H)]
        outs = [pr.communicate(timeout=1800) for pr in procs]
        for pr, (o, e) in zip(procs, outs):
            if pr.returncode != 0:
                print(e[-2000:], file=sys.stderr)
                return 1
        aggs = [_host_aggregate(o) for o, _ in outs]
        total = sum(a["total_reads"] for a in aggs)
        # pod rate = total reads over the SLOWEST host's own pipeline
        # seconds (the hosts stream concurrently; interpreter/init startup
        # is excluded on both sides, matching the H=1 denominator)
        slow = max(a["seconds"] for a in aggs)
        pod_trials.append(
            {"pod_reads_per_s": total / slow, "slow_host_s": slow, "hosts": aggs}
        )
    best_pod = max(pod_trials, key=lambda t: t["pod_reads_per_s"])
    pod_rps = best_pod["pod_reads_per_s"]

    # metrics.scaling_efficiency inline (the orchestrator runs without
    # PYTHONPATH; the workers import the package normally)
    eff = pod_rps / (H * single_rps) if single_rps > 0 else 0.0
    cores = os.cpu_count() or 1
    # on a shared box the raw vs-linear number is bounded by core
    # timesharing (1/H on 1 core even for a perfect runtime); the
    # core-normalized ratio — pod aggregate rate over the single-host rate
    # on the SAME cores — isolates the runtime/collective overhead the
    # CPU-mesh harness can actually observe (ideal = 1.0)
    eff_norm = pod_rps / (single_rps * min(H, cores)) \
        if single_rps > 0 else 0.0

    # attribution: per-1000-read stage seconds, H=1 vs the H=N mean, plus
    # the measured cross-process collective probe.  The pipeline itself is
    # collective-free across hosts, so any efficiency shortfall must show
    # up as *inflated host stages* (core/GIL contention on a shared box);
    # the probe bounds what an actual pod-wide merge would add on top.
    s1 = _stage_per_kread(single_best)
    sN_hosts = [_stage_per_kread(a) for a in best_pod["hosts"]]
    sN = {
        k: sum(h.get(k, 0.0) for h in sN_hosts) / len(sN_hosts) for k in s1
    }
    collectives = [
        a.get("collective") for a in best_pod["hosts"] if a.get("collective")
    ]
    attribution = {
        "stage_s_per_kread_h1": {k: round(v, 4) for k, v in s1.items()},
        f"stage_s_per_kread_h{H}_mean": {
            k: round(v, 4) for k, v in sN.items()
        },
        "stage_inflation": {
            k: round(sN[k] / s1[k], 2) if s1[k] > 1e-9 else None
            for k in s1
        },
        "collective_probe": collectives[0] if collectives else None,
        "note": "the stream is collective-free across hosts; shortfall "
        "from 1.0 appears as inflated host stages (shared-core "
        "contention), while collective_probe bounds the per-op cost a "
        "pod-wide merge would add",
    }
    art = {
        "backend": "cpu-mesh",
        "caveat": f"{H} jax.distributed CPU processes on one machine "
        "(cores shared): exercises the runtime/collective mechanics of "
        "BASELINE.md's scaling claim, not pod silicon",
        "cores": cores,
        "hosts": H,
        "codec": args.codec,
        "reads": args.reads,
        "read_len": args.read_len,
        "single_host_reads_per_s": round(single_rps, 1),
        f"pod_reads_per_s_h{H}": round(pod_rps, 1),
        f"scaling_efficiency_h{H}_vs_linear": round(eff, 4),
        f"scaling_efficiency_h{H}_core_normalized": round(eff_norm, 4),
        "attribution": attribution,
        "trials": args.trials,
    }
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "POD_SCALING.json",
    )
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(json.dumps(art))
    return 0


if __name__ == "__main__":
    sys.exit(main())
