"""Benchmark harness: reproduces the reference's criterion table on TPU.

The reference benches 40,000-nt strings per call on one CPU core
(reference benches/bench_n_to_bits.rs:9-82) with a memcpy baseline and an
allocation-included policy.  Here the unit of work is a large resident batch
(the TPU production shape), every op allocates its output (XLA does so per
call), an on-device memcpy is the baseline, and the denominator is ASCII
nucleotide bytes — the same convention as the reference's
``group.throughput(Bytes(40000))``.

Row groups (mirroring the complete table of reference README.md:337-380):

* device memcpy baseline (the criterion ``memcpy`` row)
* 2-bit encode, all four Pallas variants (mul / shift / interleave / mxu)
  and decode (swar / shuffle / select)
* base-5 encode (interleaved + planar) and decode (nt4 + tile-padded)
* XLA portability tier (reduced workload — it exists for CPUs/older chips)
* packed-domain ops: k-mer histogram, revcomp, GC content, Hamming
* host-native C++ oracle rows (the scalar-tier analogue, criterion's
  1.8-2.0 GiB/s scalar rows)

Each row reports throughput, the fraction of speed-of-light from the
bytes-moved roofline (utils/profiling.Roofline — codec ops are memory
bound, so SoL = HBM peak / bytes moved), and the dispatch latency
(chain intercept; through a relayed backend this is dominated by the relay
round-trip, reported honestly as such).

Timing methodology: the execution stream is asynchronous end-to-end, and on
relayed/tunneled TPU backends neither ``block_until_ready`` nor a readback of
an *independent* result reliably covers queued work — and even a donated
input returned aliased short-circuits (parameter forwarding completes before
the kernel runs).  Each measurement therefore runs a **dependent chain**
whose carried state is updated *from the op's output* with one in-place
dynamic-update-slice element (donated input, near-zero cost), and takes the
slope between two chain lengths so the fixed dispatch+readback cost cancels:
``t = (T(k_hi) - T(k_lo)) / (k_hi - k_lo)``; the intercept
``T(k_lo) - t * k_lo`` is the dispatch latency.

Prints a human table on stderr and exactly ONE JSON line on stdout:
``{"metric": ..., "value": ..., "unit": "GiB/s", "vs_baseline": ...}``
where vs_baseline compares against the reference's champion single-core
encode (n_to_bits_movemask, 28.962 GiB/s, reference README.md:349).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

#: extra rows (full-size XLA tier, base-5 u8 decode) beyond the default set
BENCH_FULL = os.environ.get("BENCH_FULL", "") == "1"
#: soft wall-clock budget; optional row groups are skipped past this
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1800"))

# persistent compile cache: a cold cache through the relayed compile
# helper measured ~2x the whole budget in compiles alone (an r04 run hit
# BUDGET_S before the stream section — the north-star rows — purely on
# compile time); the cache survives across processes so a prior run pays
# the compiles once
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

REF_BEST_ENCODE_GIBS = 28.962  # reference README.md:349 (n_to_bits_movemask)
REF_MEMCPY_GIBS = 23.599       # reference README.md:351
REF_TABLE = {                  # reference README.md:346-377 (for context)
    "encode_2bit": 28.962, "decode_2bit": 30.224,
    "encode_b5": 11.787, "decode_b5": 10.175,
}

# workload: 256 MiB of nucleotides, batch of 32768 reads x 8192 nt.
# BENCH_SCALE divides the row count (e.g. 4 -> 64 MiB): use it when the
# relayed TPU link is degraded (H2D of the full batch has been observed to
# take tens of minutes on bad days) — throughput numbers at scale >= 4 are
# within a few % of full-size for the memory-bound rows.
_SECTIONS = {
    s.strip()
    for s in os.environ.get("BENCH_SECTIONS", "").split(",")
    if s.strip()
}


def _section_on(name: str, t_start: float) -> bool:
    """Section gate: the time budget, plus an opt-in BENCH_SECTIONS filter
    (comma list of {core,xla,packed,stream,host}) for re-running one
    section in isolation (e.g. BENCH_SECTIONS=stream after a stream-path
    change). The core rows always run unless explicitly filtered out."""
    if _SECTIONS and name not in _SECTIONS:
        return False
    return time.time() - t_start < BUDGET_S


_SCALE = max(int(os.environ.get("BENCH_SCALE", "1")), 1)
ROWS = max(32768 // _SCALE, 8)
NT_PER_ROW = 8192          # % 16 == 0 (2-bit block)
NT_PER_ROW_B5 = 8208       # % 27 == 0 (base-5 block)
XLA_SCALE = 8              # XLA-tier rows run at 1/8 workload
CHAIN_LO = 8
CHAIN_HI = 40
TRIALS = 3
KMER_K = 8
# 16.8 Mnt slice for the k-mer rows; scales with the row count so scaled
# runs never ask for more words than the encode rows produced.  Rounded to
# a multiple of 128 (the planar-codes kernels reshape to 128-lane rows)
# with a 128-word floor; clamped again at the use site.
KMER_WORDS = max(((1 << 20) // _SCALE) & ~127, 128)


def main() -> int:
    import jax

    # the ambient sitecustomize pre-imports jax before this module sets
    # the cache env var, so set the config explicitly too (validated:
    # a warm cache cuts cross-process kernel compiles 5.2 -> 1.6 s)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 2.0
        )
    except Exception:  # pragma: no cover — older jax without the knobs
        pass
    import jax.numpy as jnp

    from cute_nucleotides_tpu.ops import (
        align,
        kmer,
        pallas_kernels as pk,
        search,
        seqops,
        xla,
    )
    from cute_nucleotides_tpu.ops.distance import (
        hamming_packed,
        pairwise_hamming,
        pairwise_hamming_packed,
    )
    from cute_nucleotides_tpu.utils import profiling

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    chip = "v5e"
    # match on str(dev) AND device_kind: stock TpuDevice str() is
    # "TPU_0"-style with the generation only in device_kind, so str-only
    # matching silently fell back to the v5e peak on other chips (r05)
    ident = (
        f"{dev} {getattr(dev, 'device_kind', '')}".lower()
        .replace(" lite", "e").replace("v5e0", "v5e")
    )
    for gen in profiling.HBM_GIBS:
        if gen in ident:
            chip = gen
    hbm_gibs = profiling.HBM_GIBS[chip]

    t_start = time.time()
    cur_sec = ["core"]  # updated at each gated section for the run() filter
    rng = np.random.default_rng(0xC0DEC)
    alphabet = np.frombuffer(b"ACGTUacgtu", np.uint8)
    alphabet_n = np.frombuffer(b"ACGTUNacgtun", np.uint8)

    nt_bytes = ROWS * NT_PER_ROW
    host_u8 = rng.choice(alphabet, size=(ROWS, NT_PER_ROW))
    host_nt4 = host_u8.reshape(ROWS, -1).view(np.uint32)

    results: dict[str, float] = {}
    sol: dict[str, float] = {}
    bound: dict[str, str] = {}
    latency_ms: dict[str, float] = {}
    stream_stats: dict[str, dict] = {}

    # partial runs (section filter or reduced scale) must not clobber the
    # committed full-scale hardware artifact — route them to /tmp unless
    # the caller picks a path explicitly
    default_detail = (
        "BENCH_DETAIL.json"
        if not _SECTIONS and _SCALE == 1
        else "/tmp/BENCH_DETAIL.partial.json"
    )
    detail_path = os.environ.get("BENCH_DETAIL_PATH", default_detail)

    def emit_headline():
        candidates = [
            results.get(f"encode_2bit_pallas_{v}", 0.0)
            for v in ("mul", "shift", "interleave", "mxu")
        ]
        best_encode = max(candidates) if any(candidates) else 0.0
        memcpy = results.get("memcpy_device", 0.0)
        # full per-row tables go to a durable FILE (and stderr), NOT the
        # stdout line: the driver's tail capture truncated r02's 3 KB line
        # and the headline metrics were lost.  The stdout line stays small
        # (headline scalars + per-op champions) and is json.loads-verified.
        detail = {
            "detail": {k: round(v, 3) for k, v in results.items()},
            "sol_frac": {k: round(v, 3) for k, v in sol.items()},
            "bound": dict(bound),
            "dispatch_latency_ms": {
                k: round(v, 2) for k, v in latency_ms.items()
            },
            "stream": stream_stats,
        }
        try:
            with open(detail_path, "w") as fh:
                json.dump(detail, fh, indent=1)
        except OSError as e:  # pragma: no cover
            print(f"could not write {detail_path}: {e}", file=sys.stderr)
        print(f"detail tables: {json.dumps(detail)}", file=sys.stderr)

        def champion(*names):
            vals = [results.get(n, 0.0) for n in names]
            return round(max(vals), 3) if any(vals) else None

        line = json.dumps(
            {
                "metric": "encode_2bit_throughput",
                "value": round(best_encode, 3),
                "unit": "GiB/s",
                "vs_baseline": round(best_encode / REF_BEST_ENCODE_GIBS, 3),
                "gbps_per_chip": round(best_encode * 2**30 / 1e9, 1),
                "vs_device_memcpy": round(best_encode / memcpy, 3) if memcpy else None,
                "vs_reference_memcpy": round(best_encode / REF_MEMCPY_GIBS, 2),
                "chips": 1,
                "champions_gibs": {
                    "memcpy_device": champion("memcpy_device"),
                    "decode_2bit": champion(
                        *(f"decode_2bit_pallas_{v}"
                          for v in ("swar", "shuffle", "select"))
                    ),
                    "encode_b5": champion(
                        "encode_b5_pallas", "encode_b5_pallas_planar"
                    ),
                    "decode_b5": champion(
                        "decode_b5_pallas_interleaved",
                        "decode_b5_pallas_nt4_padded",
                        "decode_b5_pallas_nt4",
                    ),
                    "encode_2bit_checked": champion("encode_2bit_pallas_checked"),
                    "encode_b5_checked": champion("encode_b5_pallas_checked"),
                    "stream_encode": champion("stream_encode_e2e"),
                    "stream_decode": champion("stream_decode_e2e"),
                    # GiB/s column reads as Gcells/s for this DP row
                    "edit_distance_gcups": champion("edit_distance_m128_n2048"),
                    "gc_b5": champion("gc_content_packed_b5"),
                },
                "detail_file": detail_path,
            }
        )
        json.loads(line)  # emitted line must parse
        if len(line) >= 4096:  # warn, never block the one stdout line
            print(f"warning: stdout line {len(line)} B", file=sys.stderr)
        print(line, flush=True)

    def on_term(signum, frame):  # driver timeout: still emit what we have
        print("SIGTERM: emitting partial results", file=sys.stderr)
        emit_headline()
        sys.exit(0)

    signal.signal(signal.SIGTERM, on_term)

    def _measure(step, state, k_lo, k_hi, trials):
        """Median (slope_seconds, intercept_seconds) over paired chains."""
        state, r = step(state)
        np.asarray(r.ravel()[:4])  # compile + warm
        slopes, intercepts = [], []
        for _ in range(trials):
            t0 = time.perf_counter()
            s = state
            for _ in range(k_lo):
                s, r = step(s)
            np.asarray(r.ravel()[:4])
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(k_hi):
                s, r = step(s)
            np.asarray(r.ravel()[:4])
            t_hi = time.perf_counter() - t0
            state = s
            slope = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
            slopes.append(slope)
            intercepts.append(max(t_lo - slope * k_lo, 0.0))
        return float(np.median(slopes)), float(np.median(intercepts))

    trace_dir = os.environ.get("BENCH_TRACE_DIR", "/tmp/bench_traces")

    def _device_duration(step, state, name, iters=6):
        """Median on-device duration of one jitted step (the chain-slope
        method is the fallback); see profiling.measure_chained_device_seconds
        for why the profiler is the primary source."""
        return profiling.measure_chained_device_seconds(
            step, state, iters=iters, log_dir=f"{trace_dir}/{name}"
        )

    def run(name, step, state, denom, roofline=None, k_lo=CHAIN_LO,
            k_hi=CHAIN_HI, trials=TRIALS, bound_override=None):
        # BENCH_SECTIONS filter: rows belong to the section marked in
        # cur_sec (rows outside any gated section are "core")
        if _SECTIONS and cur_sec[0] not in _SECTIONS:
            return 0.0
        # a single failing row must not prevent the headline JSON line
        try:
            # warm/compile, then profile for device truth
            state, r = step(state)
            np.asarray(r.ravel()[:4])
            dt_dev, state = _device_duration(step, state, name)
            dt_chain, lat = _measure(step, state, k_lo, k_hi, trials)
            dt = dt_dev if dt_dev is not None else dt_chain
        except Exception as e:  # pragma: no cover
            print(f"{name:30s} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            results[name] = 0.0
            return 0.0
        gibs = denom / dt / 2**30
        results[name] = gibs
        latency_ms[name] = lat * 1e3
        extra = "" if dt_dev is not None else "  [chain]"
        if roofline is not None:
            if bound_override is not None:
                # caller knows the honest bound and that no derived SoL
                # applies (e.g. issue-bound ops whose VPU calibration is
                # out of scope) — keep the stderr line and the JSON in
                # agreement (ADVICE r03)
                bound[name] = bound_override
                extra = f"  [{bound_override}, no SoL]" + extra
            else:
                sol[name] = roofline.efficiency(dt, hbm_gibs, chip)
                bound[name] = roofline.bound_kind(hbm_gibs, chip)
                tag = "" if bound[name] == "memory" else f" [{bound[name]}]"
                extra = f"  {sol[name] * 100:5.1f}% SoL{tag}" + extra
        print(
            f"{name:30s} {dt * 1e3:9.3f} ms   {gibs:9.2f} GiB/s{extra}",
            file=sys.stderr,
        )
        return gibs

    def chained(fn):
        """Dependent chain step: the carried state is refreshed in place from
        one element of the op output (true data dependency, ~zero cost)."""

        def step(s):
            r = fn(s)
            patch = r.ravel()[0].astype(s.dtype).reshape((1,) * s.ndim)
            return jax.lax.dynamic_update_slice(s, patch, (0,) * s.ndim), r

        return jax.jit(step, donate_argnums=0)

    def chained2(fn):
        """two-array state variant."""

        def step(s):
            a, b = s
            r = fn(a, b)
            patch = r.ravel()[0].astype(a.dtype).reshape((1,) * a.ndim)
            return (jax.lax.dynamic_update_slice(a, patch, (0,) * a.ndim), b), r

        return jax.jit(step, donate_argnums=0)

    def chained_n(fn):
        """N-array state, tuple-result variant: the patch depends on every
        output so none can be dead-code-eliminated."""

        def step(s):
            rs = fn(*s)
            rs = rs if isinstance(rs, tuple) else (rs,)
            a = s[0]
            patch = sum(
                r.ravel()[0].astype(a.dtype) for r in rs
            ).reshape((1,) * a.ndim)
            return (
                (jax.lax.dynamic_update_slice(a, patch, (0,) * a.ndim),)
                + tuple(s[1:]),
                rs[0],
            )

        return jax.jit(step, donate_argnums=0)

    R = profiling.Roofline

    # --- baselines -----------------------------------------------------------
    # memcpy chains naturally: output feeds the next copy (read N, write N)
    memcpy_step = jax.jit(lambda s: (s + jnp.uint8(0),) * 2, donate_argnums=0)
    run("memcpy_device", lambda s: memcpy_step(s), jnp.asarray(host_u8),
        nt_bytes, R(nt_bytes, nt_bytes))

    # --- 2-bit codec (Pallas, the production tier) ---------------------------
    enc_roof = profiling.encode_2bit_roofline(nt_bytes)
    for v in ("mul", "shift", "interleave"):
        run(
            f"encode_2bit_pallas_{v}",
            chained(lambda x, v=v: pk.encode_2bit_nt4(x, v)),
            jnp.asarray(host_nt4),
            nt_bytes,
            enc_roof,
        )
    run(
        "encode_2bit_pallas_mxu",
        chained(pk.encode_2bit_nt4_mxu),
        jnp.asarray(host_nt4),
        nt_bytes,
        R(enc_roof.read_bytes, enc_roof.write_bytes,
          bf16_macs=ROWS * 256 * (NT_PER_ROW // 4)),
    )
    # fused encode + validity flag (vs paying a second HBM read to validate)
    run(
        "encode_2bit_pallas_checked",
        chained(lambda x: pk.encode_2bit_nt4_checked(x, "mul")[0]),
        jnp.asarray(host_nt4),
        nt_bytes,
        enc_roof,
    )

    packed_np = np.asarray(
        jax.jit(lambda w: pk.encode_2bit_nt4(w, "mul"))(jnp.asarray(host_nt4))
    )
    dec_roof = profiling.decode_2bit_roofline(nt_bytes)
    for v in ("swar", "shuffle", "select"):
        run(
            f"decode_2bit_pallas_{v}",
            chained(lambda p, v=v: pk.decode_2bit_nt4(p, v)),
            jnp.asarray(packed_np),
            nt_bytes,
            dec_roof,
        )

    # --- base-5 codec --------------------------------------------------------
    rows_b5 = (ROWS * NT_PER_ROW_B5) // pk.B5_ROW_NT
    host_b5 = rng.choice(alphabet_n, size=(rows_b5, pk.B5_ROW_NT))
    nt_b5 = rows_b5 * pk.B5_ROW_NT

    def b5_roof(base, kernel, rows=rows_b5):
        # NOTE: the codec kernels' vpu_lane_ops audits are NOT fed into the
        # roofline — the measured VPU rate is a ceiling only for the Myers
        # rows' dependent-chain mix; the decoder demonstrably exceeds it on
        # its mixed stream (see utils/profiling.VPU_U32_GOPS scope note),
        # so the MXU + HBM terms are the honest bound here.
        i8, bf = pk.b5_kernel_macs(kernel)
        return R(
            base.read_bytes, base.write_bytes,
            int8_macs=rows * i8, bf16_macs=rows * bf,
        )

    run(
        "encode_b5_pallas",
        chained(pk.encode_b5_panels_v2),
        jnp.asarray(host_b5),
        nt_b5,
        b5_roof(profiling.encode_b5_roofline(nt_b5), "enc_inter"),
    )
    run(
        "encode_b5_pallas_planar",
        chained(lambda x: pk.encode_b5_planar(x)[0]),
        jnp.asarray(host_b5),
        nt_b5,
        b5_roof(profiling.encode_b5_roofline(nt_b5), "enc_planar"),
    )
    run(
        "encode_b5_pallas_checked",
        chained(lambda x: pk.encode_b5_panels_checked(x)[0]),
        jnp.asarray(host_b5),
        nt_b5,
        b5_roof(profiling.encode_b5_roofline(nt_b5), "enc_inter"),
    )
    w_b5 = np.asarray(jax.jit(pk.encode_b5_panels_v2)(jnp.asarray(host_b5)))
    lo = np.ascontiguousarray(w_b5.reshape(-1, 2)[:, 0]).reshape(rows_b5, 128)
    hi = np.ascontiguousarray(w_b5.reshape(-1, 2)[:, 1]).reshape(rows_b5, 128)
    run(
        "decode_b5_pallas_nt4",
        chained2(lambda a, b: pk.decode_b5_nt4_panels(a, b, padded=False)),
        (jnp.asarray(lo), jnp.asarray(hi)),
        nt_b5,
        b5_roof(profiling.decode_b5_roofline(nt_b5), "dec_nt4"),
    )
    run(
        "decode_b5_pallas_nt4_padded",
        chained2(pk.decode_b5_nt4_panels),
        (jnp.asarray(lo), jnp.asarray(hi)),
        nt_b5,
        b5_roof(
            R(8 * (nt_b5 // 27), nt_b5 * pk.B5_NT4_PAD_LANES * 4 // pk.B5_ROW_NT),
            "dec_nt4",
        ),
    )
    # the API-shape decode: interleaved u32 pairs in (the u64 stream as-is)
    run(
        "decode_b5_pallas_interleaved",
        chained(pk.decode_b5_interleaved_panels),
        jnp.asarray(w_b5.reshape(rows_b5, 2 * pk.B5_ROW_WORDS)),
        nt_b5,
        b5_roof(
            R(8 * (nt_b5 // 27), nt_b5 * pk.B5_NT4_PAD_LANES * 4 // pk.B5_ROW_NT),
            "dec_inter",
        ),
    )
    # digit-domain device format (r05): same panels, base-5 digit bytes out,
    # SWAR char conversion skipped — the decode for digit consumers
    run(
        "decode_b5_pallas_digits",
        chained(pk.decode_b5_digits_panels),
        jnp.asarray(w_b5.reshape(rows_b5, 2 * pk.B5_ROW_WORDS)),
        nt_b5,
        b5_roof(
            R(8 * (nt_b5 // 27), nt_b5 * pk.B5_NT4_PAD_LANES * 4 // pk.B5_ROW_NT),
            "dec_inter",
        ),
    )
    # fused stream-integrity check riding the decode's read (vs a separate
    # first_invalid_word_b5 pass).  Roofline: the MACs are dec_inter's, the
    # writes include the u32[R, 128] badplane; the ~4% extra VPU lane-ops of
    # the check itself are not modeled (slight SoL understatement).
    run(
        "decode_b5_pallas_checked",
        chained(lambda w: pk.decode_b5_interleaved_panels_checked(w)[0]),
        jnp.asarray(w_b5.reshape(rows_b5, 2 * pk.B5_ROW_WORDS)),
        nt_b5,
        b5_roof(
            R(
                8 * (nt_b5 // 27),
                nt_b5 * (pk.B5_NT4_PAD_LANES + 128) * 4 // pk.B5_ROW_NT,
            ),
            "dec_inter",
        ),
    )
    if BENCH_FULL:
        run(
            "decode_b5_pallas_u8",
            chained2(pk.decode_b5_panels),
            (jnp.asarray(lo), jnp.asarray(hi)),
            nt_b5,
            profiling.decode_b5_roofline(nt_b5),
        )


    # --- end-to-end streaming pipeline (BASELINE's north star: reads/s
    # through host IO -> batch assembly -> H2D -> kernel -> D2H) -------------
    if _section_on("stream", t_start):
        cur_sec[0] = "stream"
        from cute_nucleotides_tpu.parallel import runtime as rt
        from cute_nucleotides_tpu.utils import io as io_lib

        n_reads, read_len = 32768 // _SCALE, 2048  # 64 Mnt synthetic FASTQ on tmpfs
        fq = "/dev/shm/cn_bench_reads.fastq"
        try:
            sq = rng.choice(alphabet, size=(n_reads, read_len))
            with open(fq, "wb") as f:
                q = b"I" * read_len
                parts = []
                for i in range(n_reads):
                    parts.append(
                        b"@r%d\n" % i + sq[i].tobytes() + b"\n+\n" + q + b"\n"
                    )
                    if len(parts) == 4096:
                        f.write(b"".join(parts))
                        parts = []
                f.write(b"".join(parts))

            # NOTE: through a relayed/tunneled TPU these rows are LINK-bound:
            # tools/link_probe.py measures ~42 MB/s H2D (~45 D2H, near-full
            # duplex, parallel uploads do NOT sum), so a perfectly pipelined
            # encode tops out at link_rate bp/s.  ``link_saturation`` below
            # is the honest score: achieved ASCII bytes/s over a same-run
            # dependent-readback H2D measurement.  On a locally attached
            # chip the identical loop is PCIe-bound instead (~100x).
            stream_batch = 4096

            # same-run link floor: one 8 MiB H2D with a dependent readback
            # (block_until_ready is not trustworthy through the relay)
            link_buf = rng.integers(0, 255, 8 * 2**20, np.uint8)
            dev0 = jax.devices()[0]
            np.asarray(jax.device_put(link_buf, dev0).ravel()[:1])  # warm
            probes = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(jax.device_put(link_buf, dev0).ravel()[:1])
                probes.append(time.perf_counter() - t0)
            link_h2d_s = sorted(probes)[1]  # median of 3 (relay jitter)
            link_h2d_mib_s = link_buf.nbytes / link_h2d_s / 2**20
            stream_stats["link_h2d_mib_s"] = round(link_h2d_mib_s, 1)
            print(
                f"link H2D (8 MiB dependent readback): "
                f"{link_h2d_mib_s:.1f} MiB/s",
                file=sys.stderr,
            )

            # relay jitter is real (r04: the same loop scored 0.58-0.90
            # saturation across sessions), so every stream row runs
            # STREAM_REPS times and reports the MEDIAN with the min-max
            # range — a single lucky run can no longer carry the headline
            STREAM_REPS = 3

            def _median_rep(reps_out):
                reps_out = sorted(reps_out, key=lambda r: r[0])
                return reps_out[len(reps_out) // 2]

            def stream_row(name, runner):
                nt = n_reads * read_len
                enc = rt.StreamingEncoder(batch_size=stream_batch, max_len=read_len)
                # warm the compiled executable outside the timer (the first
                # row otherwise pays the jit compile in its wall time)
                warm = np.full((stream_batch, read_len), ord("A"), np.uint8)
                np.asarray(enc.sharded.encode(enc.sharded.shard(warm)))
                reps_out = []
                for _ in range(STREAM_REPS):
                    sunk = [0]
                    enc = rt.StreamingEncoder(
                        batch_size=stream_batch, max_len=read_len
                    )
                    t0 = time.perf_counter()
                    agg = runner(
                        enc, lambda w, b: sunk.__setitem__(0, sunk[0] + w.nbytes)
                    )
                    dt = time.perf_counter() - t0
                    reps_out.append((dt, agg, sunk[0]))
                dt, agg, sunk0 = _median_rep(reps_out)
                dts = [r[0] for r in reps_out]
                results[name] = nt / dt / 2**30
                sat = (nt / dt / 2**20) / link_h2d_mib_s
                stream_stats[name] = {
                    "gbp_s": round(nt / dt / 1e9, 3),
                    "reads_per_s": round(n_reads / dt, 1),
                    "ms_per_batch": round(dt * 1e3 * stream_batch / n_reads, 1),
                    "sunk_bytes": sunk0,
                    "link_saturation": round(sat, 3),
                    "runs": len(dts),
                    "link_saturation_range": [
                        round((nt / max(dts) / 2**20) / link_h2d_mib_s, 3),
                        round((nt / min(dts) / 2**20) / link_h2d_mib_s, 3),
                    ],
                    "stages": agg.get("stages", {}),
                    **{k: v for k, v in agg.items() if isinstance(v, (int, float))},
                }
                print(
                    f"{name:30s} {dt * 1e3:9.1f} ms   {results[name]:9.2f} "
                    f"GiB/s-nt  ({n_reads / dt:,.0f} reads/s, "
                    f"link sat {sat:.0%}, median of {len(dts)})",
                    file=sys.stderr,
                )

            # batch-assembler fast path (fastq_batches, no Record objects)
            stream_row(
                "stream_encode_e2e",
                lambda enc, sink: enc.run_batches(
                    io_lib.fastq_batches(fq, stream_batch, read_len), sink
                ),
            )
            # the Record-path production loop (parse -> BatchStream)
            stream_row(
                "stream_encode_records",
                lambda enc, sink: enc.run(io_lib.open_reads(fq), sink),
            )

            # decode direction: pre-encode the reads into .nup-style entries
            # (outside the timer), then time the pipelined StreamingDecoder
            # back to exact-length ASCII
            entries = []
            enc0 = rt.StreamingEncoder(
                batch_size=stream_batch, max_len=read_len
            )

            def collect(w, b):
                from cute_nucleotides_tpu.ops import spec

                for i in range(b.count):
                    nw = -(-int(b.lengths[i]) // 32)
                    entries.append(
                        (
                            b"r%d" % int(b.indices[i]),
                            int(b.lengths[i]),
                            spec.u32_pairs_to_u64(w[i])[:nw],
                        )
                    )

            enc0.run_batches(
                io_lib.fastq_batches(fq, stream_batch, read_len), collect
            )
            dec = rt.StreamingDecoder(
                batch_size=stream_batch, max_len=read_len
            )
            w32_0 = io_lib.pack_words_batch(
                entries[:stream_batch], stream_batch
            )
            np.asarray(  # warm the decode executable outside the timer
                dec.sharded.decode(
                    jax.device_put(w32_0, dec.sharded.batch_sharding)
                )
            )
            reps_out = []
            for _ in range(STREAM_REPS):
                sunk = [0]
                dec = rt.StreamingDecoder(
                    batch_size=stream_batch, max_len=read_len
                )
                t0 = time.perf_counter()
                agg = dec.run(
                    iter(entries),
                    sink=lambda n, s: sunk.__setitem__(0, sunk[0] + len(s)),
                )
                reps_out.append((time.perf_counter() - t0, agg, sunk[0]))
            dt, agg, sunk0 = _median_rep(reps_out)
            dts = [r[0] for r in reps_out]
            sunk = [sunk0]
            nt = n_reads * read_len
            results["stream_decode_e2e"] = nt / dt / 2**30
            stream_stats["stream_decode_e2e"] = {
                "gbp_s": round(nt / dt / 1e9, 3),
                "reads_per_s": round(n_reads / dt, 1),
                "ms_per_batch": round(dt * 1e3 * stream_batch / n_reads, 1),
                "sunk_bytes": sunk[0],
                # decode's dominant transfer is the ASCII D2H (probe: D2H
                # bandwidth ~= H2D), so the same-run H2D rate is the floor
                "link_saturation": round(
                    (nt / dt / 2**20) / link_h2d_mib_s, 3
                ),
                "runs": len(dts),
                "link_saturation_range": [
                    round((nt / max(dts) / 2**20) / link_h2d_mib_s, 3),
                    round((nt / min(dts) / 2**20) / link_h2d_mib_s, 3),
                ],
                "stages": agg.get("stages", {}),
                **{
                    k: v
                    for k, v in agg.items()
                    if isinstance(v, (int, float))
                },
            }
            print(
                f"{'stream_decode_e2e':30s} {dt * 1e3:9.1f} ms   "
                f"{results['stream_decode_e2e']:9.2f} GiB/s-nt  "
                f"({n_reads / dt:,.0f} reads/s)",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover
            print(f"stream rows FAILED: {type(e).__name__}: {e}", file=sys.stderr)
        finally:
            if os.path.exists(fq):
                os.unlink(fq)



    # --- XLA portability tier (reduced workload by default) ------------------
    if _section_on("xla", t_start):
        cur_sec[0] = "xla"
        xrows = ROWS if BENCH_FULL else ROWS // XLA_SCALE
        x_u8 = host_u8[:xrows]
        x_nt = xrows * NT_PER_ROW
        xk = dict(k_lo=4, k_hi=20, trials=3) if not BENCH_FULL else {}
        run(
            "encode_2bit_xla_mul",
            chained(lambda x: xla.encode_2bit_words(x, "mul")),
            jnp.asarray(x_u8),
            x_nt,
            profiling.encode_2bit_roofline(x_nt),
            **xk,
        )
        run(
            "encode_2bit_xla_dot",
            chained(lambda x: xla.encode_2bit_words(x, "dot")),
            jnp.asarray(x_u8),
            x_nt,
            profiling.encode_2bit_roofline(x_nt),
            **xk,
        )
        x_words = packed_np[:xrows].reshape(xrows, -1).view(np.uint32)
        run(
            "decode_2bit_xla_shuffle",
            chained(lambda w: xla.decode_2bit_bytes(w, "shuffle")),
            jnp.asarray(x_words),
            x_nt,
            profiling.decode_2bit_roofline(x_nt),
            **xk,
        )
        run(
            "decode_2bit_xla_broadcast",
            chained(lambda w: xla.decode_2bit_bytes(w, "broadcast")),
            jnp.asarray(x_words),
            x_nt,
            profiling.decode_2bit_roofline(x_nt),
            **xk,
        )
        xrows5 = rows_b5 if BENCH_FULL else rows_b5 // XLA_SCALE
        xb5 = host_b5[:xrows5]
        x_nt5 = xrows5 * pk.B5_ROW_NT
        run(
            "encode_b5_xla",
            chained(xla.encode_b5_words),
            jnp.asarray(xb5),
            x_nt5,
            profiling.encode_b5_roofline(x_nt5),
            **xk,
        )
        words_b5x = np.asarray(
            jax.jit(xla.encode_b5_words)(jnp.asarray(xb5))
        )
        run(
            "decode_b5_xla",
            chained(xla.decode_b5_bytes),
            jnp.asarray(words_b5x),
            x_nt5,
            profiling.decode_b5_roofline(x_nt5),
            **xk,
        )

    # --- packed-domain ops ---------------------------------------------------
    if _section_on("packed", t_start):
        cur_sec[0] = "packed"
        words_flat = packed_np.reshape(-1).view(np.uint32)
        # clamp to what the encode rows actually produced (128-multiple so
        # the planar reshape below always divides), THEN derive the length
        # from the real slice so the two can never disagree
        kmw = max(min(KMER_WORDS, words_flat.size) & ~127, 128)
        kwords = words_flat[:kmw]
        klen = 16 * kmw
        # k-mer EXTRACTION alone (funnel-shift kernel; output 16 codes/word
        # dominates traffic: 4 B in + 64 B out per input word)
        kw2d = words_flat[:kmw].reshape(-1, 128)  # 64 MiB output/step
        knxt = np.roll(kw2d.reshape(-1), -1).reshape(kw2d.shape)
        run(
            "kmer_codes_k15",
            chained2(lambda w, n: kmer.kmer_codes_planar(w, n, 15)),
            (jnp.asarray(kw2d), jnp.asarray(knxt)),
            16 * kw2d.size,
            R(8 * kw2d.size, 64 * kw2d.size),
            k_lo=4, k_hi=20, trials=3,
        )
        # MXU-bound by design: 2 x 256-bin one-hot rows contracted per code
        # element = 65536 dense int8 MACs/element (the scatter-add
        # alternative measured ~20x slower; see ops/kmer.py)
        run(
            "kmer_histogram_k8",
            chained(
                lambda w: kmer.kmer_histogram(w, length=klen, k=KMER_K)
            ),
            jnp.asarray(kwords),
            klen,
            R(4 * kmw, 4 * 4**KMER_K,
              int8_macs=65536 * 16 * kmw),
            k_lo=4, k_hi=20, trials=3,
        )
        # production-k extraction: u32-pair codes, two successor taps
        # (4 B in x3 + 128 B out per input word)
        kn2 = np.roll(kw2d.reshape(-1), -2).reshape(kw2d.shape)
        run(
            "kmer_codes_k31_pair",
            chained_n(lambda w, n, n2: kmer.kmer_codes_planar_pair(w, n, n2, 31)),
            (jnp.asarray(kw2d), jnp.asarray(knxt), jnp.asarray(kn2)),
            16 * kw2d.size,
            R(12 * kw2d.size, 128 * kw2d.size),
            k_lo=4, k_hi=20, trials=3,
        )
        # production-k counting: planar extract (0.03 ms) + 2-key sort +
        # segment counts.  >= 95% of the time IS jax.lax.sort — within ~2x
        # of the derived full-bitonic VPU floor, and every expressible
        # restructuring measured slower (DESIGN §5 sort derivation) — so
        # the row carries the honest bound tag, no SoL
        kc_words = words_flat[: 1 << 18]
        kc_len = 16 * kc_words.size
        run(
            "kmer_counts_k21",
            chained(lambda w: kmer.kmer_counts(w, kc_len, 21)[2]),
            jnp.asarray(kc_words),
            kc_len,
            R(12 * kc_words.size, 8 * (kc_len - 20)),
            k_lo=2, k_hi=8, trials=3,
            bound_override="sort",
        )
        # (w=10, k=15)-minimizer sketch: the fused Pallas s-plane scan
        # (hash + windowed min/max never leave VMEM; ops/pallas_kernels.py
        # _minimizer_kernel).  VPU-issue-bound: the hand lane-op audit
        # (~50-60 ops/position) would imply > the 4-ALU theoretical peak,
        # i.e. the audit overcounts post-fusion ops — the same calibration
        # collapse DESIGN §4 records for the codec rows, so the row gets
        # the honest bound tag without a derived SoL (see DESIGN §4).
        mz_words = words_flat[: kmw // 2]
        mz_len = 16 * mz_words.size
        run(
            "minimizers_w10_k15",
            chained(lambda w: kmer.minimizers(w, mz_len, 15, 10)[0]),
            jnp.asarray(mz_words),
            mz_len,
            R(4 * mz_words.size, 16 * mz_words.size),  # u32 in, bool out
            k_lo=4, k_hi=20, trials=3,
            bound_override="vpu",
        )
        # packed-native form: 1 bit/position out, nothing per-position in
        # HBM (the form sharded/streaming consumers compose with)
        run(
            "minimizer_bits_w10_k15",
            chained(lambda w: kmer.minimizer_bits(w, mz_len, 15, 10)),
            jnp.asarray(mz_words),
            mz_len,
            R(4 * mz_words.size, 4 * mz_words.size),
            k_lo=4, k_hi=20, trials=3,
            bound_override="vpu",
        )
        # dataset MinHash sketch (Mash bottom-1000, production k): the r04
        # fused planar hash kernel (0.1 ms) + the chunked single-key
        # distinct sort, which now dominates — sort-bound like kmer_counts
        # (DESIGN §5 sort derivation)
        from cute_nucleotides_tpu.ops import sketch as sketch_lib

        run(
            "sketch_bottom1k_k21",
            chained(
                lambda w: sketch_lib.bottom_k_sketch(w, kc_len, 21, 1000)
            ),
            jnp.asarray(kc_words),
            kc_len,
            R(12 * kc_words.size, 4 * 16 * kc_words.size),
            k_lo=2, k_hi=8, trials=3,
            bound_override="sort",
        )
        run(
            "revcomp_packed",
            chained(lambda w: seqops.revcomp_packed(w, 16 * words_flat.size)),
            jnp.asarray(words_flat),
            16 * words_flat.size,
            R(4 * words_flat.size, 4 * words_flat.size),
        )
        # ragged length: exercises the funnel-shift path (real reads are
        # rarely word-aligned); the 2-pass rewrite shows up here
        run(
            "revcomp_packed_ragged",
            chained(
                lambda w: seqops.revcomp_packed(w, 16 * words_flat.size - 7)
            ),
            jnp.asarray(words_flat),
            16 * words_flat.size,
            R(4 * words_flat.size, 4 * words_flat.size),
        )
        run(
            "gc_content_packed",
            chained(seqops.gc_content_packed),
            jnp.asarray(words_flat),
            16 * words_flat.size,
            R(4 * words_flat.size, 4),
        )
        # packed-domain pattern search (Pallas bitmask scan): bit s of
        # output lane w = match at position 16w+s, so the result is one u32
        # per input word; denominator is packed bytes read (in-bytes).
        # VPU-issue-bound, degrading with query words.  r04: the halo
        # rides its own (rows, 128) array (no 1.25x panel copy) and the
        # tail clear is fused in-kernel — the two wrapper passes were 39%
        # of the op (7 nt 58.8 -> 91.4 GiB/s).  The hand lane-op audit
        # lands ABOVE the measured VPU rate (the codec rows' calibration
        # collapse), so the rows carry the bound tag without a derived
        # SoL; DESIGN §5 has the measured query-scaling table
        for qtag, query in (
            ("7nt", b"GATTACA"),
            ("45nt", b"ACGT" * 11 + b"A"),
        ):
            run(
                f"search_scan_{qtag}",
                chained(
                    lambda w, q=query: search.match_bits(
                        w, 16 * words_flat.size, q
                    )
                ),
                jnp.asarray(words_flat),
                4 * words_flat.size,
                R(4 * words_flat.size, 4 * words_flat.size),
                bound_override="vpu",
            )
        wb5_flat = w_b5.reshape(-1)
        # base-5 packed search (Pallas r04: MXU de-interleave + funnel
        # triplet extraction + phase-fold compares, packed 27-bit output);
        # same in-bytes denominator convention as the 2-bit scan rows.
        # Reads are 1.25x the stream (128 overlap words per 512-word row),
        # writes one u32 of match bits per u64 word
        b5s_rows = -(-wb5_flat.size // (2 * pk.B5_SEARCH_WORDS))
        run(
            "search_b5_7nt",
            chained(
                lambda w: search.match_bits_b5(
                    w, (wb5_flat.size // 2) * 27, b"GATTACA"
                )
            ),
            jnp.asarray(wb5_flat),
            4 * wb5_flat.size,
            R(5 * wb5_flat.size, 2 * wb5_flat.size,
              bf16_macs=b5s_rows * pk.b5_kernel_macs("search_inter")[1]),
        )
        # long-query scaling: 45 nt rides the r05 anchor-tap prefilter
        q45_b5 = bytes(
            rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=45)
        )
        run(
            "search_b5_45nt",
            chained(
                lambda w: search.match_bits_b5(
                    w, (wb5_flat.size // 2) * 27, q45_b5
                )
            ),
            jnp.asarray(wb5_flat),
            4 * wb5_flat.size,
            R(5 * wb5_flat.size, 2 * wb5_flat.size,
              bf16_macs=b5s_rows * pk.b5_kernel_macs("search_inter")[1]),
            bound_override="vpu",
        )
        # routes to the Pallas kernel (MXU gather-fold triplet extraction);
        # roofline carries its dense bf16 MACs + audited VPU lane-ops
        gc_rows = -(-wb5_flat.size // (2 * pk.B5_ROW_WORDS))
        run(
            "gc_content_packed_b5",
            chained(lambda w: seqops.gc_content_packed_b5(w)[None]),
            jnp.asarray(wb5_flat),
            (wb5_flat.size // 2) * 27,
            R(4 * wb5_flat.size, 4 * gc_rows,
              bf16_macs=gc_rows * pk.b5_kernel_macs("gc_inter")[1]),
        )
        # base-5 packed revcomp at a ragged length (digit-funnel path);
        # ALU-bound: the audited VPU lane-op term is the honest ceiling
        rc5_len = (wb5_flat.size // 2) * 27 - 5
        run(
            "revcomp_packed_b5",
            chained(lambda w: seqops.revcomp_packed_b5(w, rc5_len)),
            jnp.asarray(wb5_flat),
            (wb5_flat.size // 2) * 27,
            R(4 * wb5_flat.size, 4 * wb5_flat.size),
            # the XLA digit funnel is ALU/issue-bound, not HBM-bound (audit:
            # seqops.revcomp_b5_xla_lane_ops — ~250 emitted exprs per lane,
            # far above the bytes term), but the measured VPU rate is not a
            # valid ceiling for its post-CSE mix (see profiling.VPU_U32_GOPS
            # scope note) — tag the bound honestly and emit no bytes-only
            # SoL, which would misread as "10% of light" for an op at its
            # issue ceiling.
            bound_override="vpu",
        )
        wa = packed_np.reshape(ROWS, -1).view(np.uint32)
        run(
            "hamming_packed",
            chained2(hamming_packed),
            (jnp.asarray(wa), jnp.asarray(np.roll(wa, 1, axis=0))),
            16 * wa.size,  # nt compared (reads both streams: 0.5 B/nt)
            R(8 * wa.size, 4 * ROWS),
        )
        # all-pairs distances, B=4096 x L=8192 (int8 MXU, compute-bound:
        # B^2 * 4L MACs; the GiB/s column is input-bytes and NOT the story)
        # clamp to the actual row count so scaled runs don't claim 4096^2
        # MACs for a smaller slice (sol > 1 artifact at BENCH_SCALE >= 16)
        ph_B = min(4096, ROWS)
        run(
            "pairwise_hamming_4096",
            chained(pairwise_hamming),
            jnp.asarray(host_u8[:ph_B]),
            ph_B * NT_PER_ROW,
            R(ph_B * NT_PER_ROW, 4 * ph_B * ph_B,
              int8_macs=ph_B * ph_B * 4 * NT_PER_ROW),
            k_lo=2, k_hi=10, trials=3,
        )
        # batched Myers edit distance: B pairs of (128-nt query, 2048-nt
        # text), global Levenshtein.  Strictly sequential along the text,
        # so the parallelism is lanes x bit-rows; the denominator is DP
        # CELLS, i.e. the "GiB/s" column reads as Gcells/s (GCUPS).
        # vpu_lane_ops: hand count of the scan step on (B,) u32 vectors —
        # eq-select 3+3nb, adder/Xh/Ph/Mh 16nb, score-bit 9nb+2, shift
        # phase 10nb, freeze 2nb+2 => 40nb+7 per step at nb=4 blocks.
        al_B = min(8192, ROWS)
        al_m, al_n = 128, 2048
        al_q = jnp.asarray(wa[:al_B, : al_m // 16].copy())
        al_t = jnp.asarray(wa[:al_B, : al_n // 16].copy())
        al_ql = jnp.full((al_B,), al_m, jnp.int32)
        al_tl = jnp.full((al_B,), al_n, jnp.int32)
        run(
            "edit_distance_m128_n2048",
            chained(
                lambda q: align.edit_distance_packed(q, al_ql, al_t, al_tl)
            ),
            al_q,
            al_B * al_m * al_n,
            R(4 * (al_q.size + al_t.size), 4 * al_B,
              vpu_lane_ops=al_B * al_n * (40 * (al_m // 32) + 7)),
            k_lo=2, k_hi=8, trials=3,
        )
        # approximate search over ONE long stream (best_match_stream's
        # device core): the 2m-2-halo row split turns the text-sequential
        # scan lane-parallel; denominator is DP cells (GCUPS), m=21
        ap_q = b"GATTACAGATTACAGATTACA"
        ap_peq, ap_m = align.peq_from_bytes(ap_q)
        ap_w = words_flat[: min(words_flat.size, 4 << 20)]
        ap_plan = align.stream_rows_plan(ap_w.size, ap_m)
        ap_nb = ap_peq.shape[1]
        ap_R, ap_wrb, ap_H = ap_plan
        run(
            "approx_stream_m21",
            chained(
                lambda w: jnp.stack(
                    align._best_match_stream_impl(
                        jnp.asarray(ap_peq), w,
                        jnp.int32(16 * ap_w.size), ap_m, ap_plan,
                    )
                )
            ),
            jnp.asarray(ap_w),
            16 * ap_w.size * ap_m,
            R(4 * ap_w.size, 8,
              vpu_lane_ops=ap_R * 16 * (ap_wrb + ap_H) * (40 * ap_nb + 7)),
            k_lo=2, k_hi=8, trials=3,
        )
        # same distances straight from packed words (0.25 B/nt read)
        wph = packed_np[:ph_B].reshape(ph_B, -1).view(np.uint32)
        run(
            "pairwise_hamming_packed_4096",
            chained(pairwise_hamming_packed),
            jnp.asarray(wph),
            ph_B * NT_PER_ROW,
            R(4 * wph.size, 4 * ph_B * ph_B,
              int8_macs=ph_B * ph_B * 4 * NT_PER_ROW),
            k_lo=2, k_hi=10, trials=3,
        )
    if _section_on("host", t_start):
        cur_sec[0] = "host"
        from cute_nucleotides_tpu.ops import native

        if native.available():
            hb = host_u8[:4096].reshape(-1)  # 32 Mnt

            def host_row(name, fn, denom):
                times = []
                fn()  # warm
                for _ in range(5):
                    t0 = time.perf_counter()
                    fn()
                    times.append(time.perf_counter() - t0)
                dt = float(np.median(times))
                results[name] = denom / dt / 2**30
                latency_ms[name] = 0.0
                print(
                    f"{name:30s} {dt * 1e3:9.3f} ms   {results[name]:9.2f} GiB/s",
                    file=sys.stderr,
                )

            host_row("host_memcpy", lambda: native.memcpy(hb), hb.size)
            host_row("host_oracle_encode", lambda: native.n_to_bits(hb), hb.size)
            hw = native.n_to_bits(hb)
            host_row(
                "host_oracle_decode",
                lambda: native.bits_to_n(hw, hb.size),
                hb.size,
            )
            # host Myers (u64 single-thread): denominator is DP cells, so
            # the column reads Gcells/s — the comparator for the device
            # GCUPS rows (edit_distance_*/approx_stream_*)
            hm_q = bytes(host_u8[0, :128])
            hm_t = bytes(hb[: 1 << 20])
            host_row(
                "host_myers_m128",
                lambda: native.best_match(hm_q, hm_t),
                len(hm_q) * len(hm_t),
            )

    # --- headline ------------------------------------------------------------
    best_encode = max(
        results.get(f"encode_2bit_pallas_{v}", 0.0)
        for v in ("mul", "shift", "interleave", "mxu")
    )
    memcpy = results.get("memcpy_device", 0.0)
    if memcpy:
        print(
            f"\nbest 2-bit encode: {best_encode:.2f} GiB/s "
            f"({best_encode / memcpy:.2f}x device memcpy; reference best "
            f"{REF_BEST_ENCODE_GIBS} GiB/s = {REF_BEST_ENCODE_GIBS / REF_MEMCPY_GIBS:.2f}x its memcpy)",
            file=sys.stderr,
        )
        b5d = max(
            results.get("decode_b5_pallas_interleaved", 0.0),
            results.get("decode_b5_pallas_nt4_padded", 0.0),
            results.get("decode_b5_pallas_nt4", 0.0),
        )
        print(
            f"base-5 decode: {b5d:.2f} GiB/s ({b5d / memcpy:.2f}x device "
            f"memcpy; reference {REF_TABLE['decode_b5']} = "
            f"{REF_TABLE['decode_b5'] / REF_MEMCPY_GIBS:.2f}x its memcpy)",
            file=sys.stderr,
        )
    emit_headline()
    return 0


def _backend_reachable(timeout_s: float) -> bool:
    """Probe JAX backend init in a subprocess with a hard timeout.

    The relayed TPU backend has been observed to HANG at init when the
    relay is down (not fail) — and `import jax; jax.devices()` in-process
    would hang this harness with it, so the driver would record nothing.
    A subprocess probe turns that hang into a parseable outage line.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('OK')"],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
        return "OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _outage_line() -> dict:
    """Headline for a relay-down run: the last committed hardware
    measurement (clearly tagged stale) beats reporting zeros — the numbers
    were produced by this same code on the real chip; the tag and error
    fields keep the provenance honest."""
    line = {
        "metric": "encode_2bit_pallas",
        "value": 0.0,
        "unit": "GiB/s",
        "vs_baseline": 0.0,
        "error": "tpu backend unreachable (init hang > probe timeout)",
    }
    last = os.environ.get("BENCH_LAST_HW_PATH", "BENCH_LOCAL_r04.json")
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".", last)) as f:
            prev = json.load(f)
        if isinstance(prev, dict) and prev.get("unit") == "GiB/s":
            line.update({k: prev[k] for k in (
                "metric", "value", "unit", "vs_baseline", "vs_device_memcpy",
                "vs_reference_memcpy") if k in prev})
            line["stale_hardware_run"] = last
            line["error"] = (
                "tpu relay down at bench time; values are this round's "
                f"committed hardware run ({last})")
    except (OSError, ValueError):
        pass
    return line


if __name__ == "__main__":
    probe_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "240"))
    if probe_s > 0 and not _backend_reachable(probe_s):
        print(
            f"backend init did not complete within {probe_s:.0f}s "
            "(TPU relay down?) — emitting outage line",
            file=sys.stderr,
        )
        print(json.dumps(_outage_line()))
        sys.exit(0)
    sys.exit(main())
