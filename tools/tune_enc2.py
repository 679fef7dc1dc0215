"""On-TPU A/B: two-stage factorization of the base-5 encode matmul.

The shipped encoder is MXU-bound at ~71% of its bf16 roofline
(docs/DESIGN.md SS4): per 1728-nt group, one (1728, 256) bf16 dot with
coefficients (1|5|25) * 2^(7j').  Factoring it as

  stage 1 (int8):  digits (1728) -> triplet values t = d0 + 5 d1 + 25 d2
                   (K=1728, N=576, coefficients {1,5,25} — int8-exact,
                   t <= 124 so the i32 -> bf16 recast is exact)
  stage 2 (bf16):  t (576) -> u32 chunk planes with coefficients 2^(7j')
                   (K=576, N=256)

costs ~1728x576 int8 + 576x256 bf16 ~= 0.65x the shipped dense bf16 MACs
(int8 at ~2x rate), IF the int8 stage's non-128-aligned N=576 doesn't pad
away the win and the extra VPU recast doesn't serialize.  The r02 lesson
that "int8 loses when it multiplies the column count" was about slicing
VALUES into coefficient planes; this splits the ALGEBRA, so it has to be
measured on its own.

    PYTHONPATH=.:/root/.axon_site timeout 1800 python tools/tune_enc2.py
    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/tune_enc2.py --selftest
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

    from cute_nucleotides_tpu.ops import pallas_kernels as pk, spec
    from cute_nucleotides_tpu.utils import profiling

    GRP = pk.B5_ENC_GRP_NT     # 1728
    GU = pk.B5_ENC_GRP_U32     # 128
    NGRP = pk.B5_ROW_NT // GRP
    NTRIP = GRP // 3           # 576 triplets per group

    def mat_stage1() -> np.ndarray:
        """(1728, 576) int8: digit k of triplet (w, j) -> col 9w+j, 5^k."""
        s = np.zeros((GRP, NTRIP), np.int8)
        for w in range(GRP // 27):
            for j in range(9):
                for k in range(3):
                    s[27 * w + 3 * j + k, 9 * w + j] = 5**k
        return s

    def mat_stage2() -> np.ndarray:
        """(576, 256) bf16: triplet (w, j) -> P/Q chunk planes, 2^(7(j-3c))
        (the shipped _b5_enc_mat_inter with the 5^k factor moved to stage 1;
        see ops/pallas_kernels.py for the P/Q duplicated-column layout)."""
        m = np.zeros((NTRIP, 2 * GU), np.float32)
        for w in range(GRP // 27):
            for j in range(9):
                c = j // 3
                coef = float(1 << (7 * (j - 3 * c)))
                row = 9 * w + j
                if c == 0:
                    m[row, 2 * w] = coef
                elif c == 1:
                    m[row, 2 * w + 1] = coef
                    m[row, 128 + 2 * w] = coef
                else:
                    m[row, 128 + 2 * w + 1] = coef
        return m.astype(jnp.bfloat16)

    def make_encoder(twostage: bool):
        mats = (
            (jnp.asarray(mat_stage1()), jnp.asarray(mat_stage2()))
            if twostage
            else (pk._b5_enc_mat_inter(),)
        )

        def kernel(x_ref, *refs):
            o_ref = refs[-1]
            m_refs = refs[:-1]
            x = x_ref[:].astype(jnp.int32)
            sh = (x & 7) << 2
            digits = (jnp.int32(spec.DIGIT_LUT8_U32) >> sh) & 0xF
            rb = digits.shape[0]
            odd = (
                jax.lax.broadcasted_iota(jnp.int32, (rb, GU), 1) & 1
            ) == 1
            for g in range(NGRP):
                d = jax.lax.slice(digits, (0, GRP * g), (rb, GRP * (g + 1)))
                if twostage:
                    t = jnp.dot(
                        d.astype(jnp.int8),
                        m_refs[0][:],
                        preferred_element_type=jnp.int32,
                    )
                    z = jnp.dot(
                        t.astype(jnp.bfloat16),
                        m_refs[1][:],
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32).astype(jnp.uint32)
                else:
                    z = jnp.dot(
                        d.astype(jnp.bfloat16),
                        m_refs[0][:],
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32).astype(jnp.uint32)
                p = jax.lax.slice(z, (0, 0), (rb, GU))
                q = jax.lax.slice(z, (0, GU), (rb, 2 * GU))
                o_ref[:, GU * g : GU * (g + 1)] = jnp.where(
                    odd, (p >> 11) | (q << 10), p | ((q & jnp.uint32(0x7FF)) << 21)
                )

        def encode(x):
            R = x.shape[0]
            rb = pk._row_block8(R)
            mat_specs = [
                pl.BlockSpec(
                    m.shape, lambda i: (0,) * m.ndim, memory_space=pltpu.VMEM
                )
                for m in mats
            ]
            return pl.pallas_call(
                kernel,
                grid=(pk._cdiv(R, rb),),
                in_specs=[
                    pl.BlockSpec(
                        (rb, pk.B5_ROW_NT), lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    *mat_specs,
                ],
                out_specs=pl.BlockSpec(
                    (rb, pk.B5_ROW_U32), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((R, pk.B5_ROW_U32), jnp.uint32),
                interpret=pk._auto_interpret(False),
            )(x, *mats)

        return encode

    rng = np.random.default_rng(0xE2C)
    rows = 8192 if not selftest else 64
    host = rng.choice(
        np.frombuffer(b"ACGTUNacgtun", np.uint8), size=(rows, pk.B5_ROW_NT)
    )
    nt = host.size

    small = jnp.asarray(host[: min(rows, 256)])
    want = np.asarray(pk.encode_b5_panels_v2(small))
    fns = {}
    for name, two in (("shipped", False), ("twostage", True)):
        fn = make_encoder(two)
        got = np.asarray(jax.jit(fn)(small))
        ok = np.array_equal(got, want)
        print(f"{name:10s} {'bit-exact' if ok else 'WRONG'}", flush=True)
        if ok:
            fns[name] = fn
    if selftest:
        ok = len(fns) == 2
        print("selftest", "PASS" if ok else "FAIL", flush=True)
        return 0 if ok else 1

    def chained(fn):
        def step(s):
            w = fn(s)
            patch = (w.ravel()[0] & jnp.uint32(0xFF)).astype(jnp.uint8)
            patch = jnp.maximum(patch, jnp.uint8(65)).reshape((1, 1))
            return jax.lax.dynamic_update_slice(s, patch, (0, 0)), w

        return jax.jit(step, donate_argnums=0)

    def measure(name, fn):
        step = chained(fn)
        state = jnp.asarray(host)
        state, w = step(state)
        np.asarray(w.ravel()[:4])
        dt, _ = profiling.measure_chained_device_seconds(
            step, state, iters=8, log_dir=f"/tmp/tune_enc2/{name}"
        )
        if dt is None:
            print(f"{name:14s} NO PROFILE", flush=True)
            return None
        print(
            f"{name:14s} {dt * 1e3:8.3f} ms  {nt / dt / 2**30:8.2f} GiB/s",
            flush=True,
        )
        return nt / dt / 2**30

    print("--- 2 reps ---", flush=True)
    res = {}
    for rep in range(2):
        for name, fn in fns.items():
            g = measure(f"{name}#{rep}", fn)
            if g:
                res.setdefault(name, []).append(g)
    base = max(res.get("shipped", [0]))
    for name, gs in sorted(res.items(), key=lambda kv: -max(kv[1])):
        rel = f"{(max(gs) / base - 1) * 100:+6.1f}%" if base else "  n/a"
        print(f"{name:14s} {max(gs):8.2f} GiB/s  {rel}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
