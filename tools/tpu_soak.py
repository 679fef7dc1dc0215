"""Randomized hardware soak: varied shapes and data through every kernel.

The Pallas kernels are bit-exact in interpret mode by construction; real
Mosaic lowering is the residual risk (a sub-register store sequence in an
early base-5 encode was miscompiled for rare inputs).  This soak drives the
compiled kernels across a grid of row counts (including non-block multiples
that exercise grid padding), lane widths, and random seeds, asserting oracle
parity on every byte.

    PYTHONPATH=. python tools/tpu_soak.py --rounds 8
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cute_nucleotides_tpu.ops import oracle, pallas_kernels as pk, spec

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(args.seed)
    alpha = np.frombuffer(b"ACGTUacgtu", np.uint8)
    alpha_n = np.frombuffer(b"ACGTUNacgtun", np.uint8)

    enc2 = {v: jax.jit(lambda w, v=v: pk.encode_2bit_nt4(w, v)) for v in ("mul", "shift", "interleave")}
    dec2 = {v: jax.jit(lambda q, v=v: pk.decode_2bit_nt4(q, v)) for v in ("swar", "shuffle", "select")}
    enc2_mxu = jax.jit(pk.encode_2bit_nt4_mxu)
    enc5 = jax.jit(pk.encode_b5_planar)
    dec5_nt4 = jax.jit(
        lambda lo, hi: pk.decode_b5_nt4_panels(lo, hi, padded=False)
    )
    dec5_pad = jax.jit(lambda a, b: pk.decode_b5_nt4_panels(a, b, padded=True))
    dec5_inter = jax.jit(pk.decode_b5_interleaved_panels)
    dec5_chk = jax.jit(pk.decode_b5_interleaved_panels_checked)
    dec5_u8 = jax.jit(pk.decode_b5_panels)

    shapes_2bit = [(8, 512), (13, 512), (100, 2048), (256, 1024), (32, 512 * 7)]
    rows_b5 = [1, 3, 8, 23, 64]
    failures = 0
    t0 = time.time()

    for rnd in range(args.rounds):
        # --- 2-bit ----------------------------------------------------------
        for R, C in shapes_2bit:
            s = rng.choice(alpha, size=R * C * 4)
            want_w = oracle.n_to_bits_lut(s)
            want_seq = oracle.bits_to_n_lut(want_w, s.size)
            nt4 = jnp.asarray(s.view(np.uint32).reshape(R, C))
            for v, fn in enc2.items():
                got = np.ascontiguousarray(np.asarray(fn(nt4)).reshape(-1)).view(np.uint32)
                if not np.array_equal(spec.u32_pairs_to_u64(got), want_w):
                    print(f"FAIL enc2[{v}] {R}x{C} round {rnd}", file=sys.stderr)
                    failures += 1
            if C % 512 == 0:
                got = np.ascontiguousarray(np.asarray(enc2_mxu(nt4)).reshape(-1))
                if not np.array_equal(spec.u32_pairs_to_u64(got), want_w):
                    print(f"FAIL enc2[mxu] {R}x{C} round {rnd}", file=sys.stderr)
                    failures += 1
            packed = jnp.asarray(
                spec.u64_to_u32_pairs(want_w).reshape(-1).view(np.uint8).reshape(R, C)
            )
            for v, fn in dec2.items():
                got = np.ascontiguousarray(np.asarray(fn(packed)).reshape(-1)).view(np.uint8)
                if not np.array_equal(got, want_seq):
                    print(f"FAIL dec2[{v}] {R}x{C} round {rnd}", file=sys.stderr)
                    failures += 1

        # --- base-5 ---------------------------------------------------------
        for R in rows_b5:
            s = rng.choice(alpha_n, size=R * pk.B5_ROW_NT)
            want_w = oracle.n_to_bits2_lut(s)
            want_seq = oracle.bits_to_n2_lut(want_w, s.size)
            lo, hi = enc5(jnp.asarray(s.reshape(R, pk.B5_ROW_NT)))
            lo_np, hi_np = np.asarray(lo), np.asarray(hi)
            got_w = (lo_np.astype(np.uint64) | (hi_np.astype(np.uint64) << 32)).reshape(-1)
            if not np.array_equal(got_w, want_w):
                print(f"FAIL enc5 R={R} round {rnd}", file=sys.stderr)
                failures += 1
            got = np.ascontiguousarray(np.asarray(dec5_nt4(lo, hi)).reshape(-1)).view(np.uint8)
            if not np.array_equal(got, want_seq):
                print(f"FAIL dec5[nt4] R={R} round {rnd}", file=sys.stderr)
                failures += 1
            got = np.asarray(dec5_u8(lo, hi)).reshape(-1)
            if not np.array_equal(got, want_seq):
                print(f"FAIL dec5[u8] R={R} round {rnd}", file=sys.stderr)
                failures += 1
            pad = np.asarray(dec5_pad(lo, hi)).reshape(R, 8, 112)
            got = np.ascontiguousarray(
                np.ascontiguousarray(pad[:, :, :108]).reshape(-1)
            ).view(np.uint8)
            if not np.array_equal(got, want_seq) or not np.all(
                pad[:, :, 108:] == 0x41414141
            ):
                print(f"FAIL dec5[pad] R={R} round {rnd}", file=sys.stderr)
                failures += 1
            inter = jnp.asarray(
                np.ascontiguousarray(want_w).view("<u4").reshape(R, 256)
            )
            got = pk.depad_nt4_host(np.asarray(dec5_inter(inter)))
            if not np.array_equal(got, want_seq):
                print(f"FAIL dec5[inter] R={R} round {rnd}", file=sys.stderr)
                failures += 1
            # fused checked decode: panels parity + clean flag on the valid
            # stream, and a corrupted word (random row/triplet each round)
            # must flag exactly its row
            pan_c, badp = dec5_chk(inter)
            inter_bad = np.asarray(inter).copy()
            rbad = int(rng.integers(0, R))
            wbad = int(rng.integers(0, 128))
            if rng.integers(0, 2):
                inter_bad[rbad, 2 * wbad] |= np.uint32(0x7F)  # triplet 0 -> 127
            else:
                inter_bad[rbad, 2 * wbad + 1] |= np.uint32(1) << 31  # pad bit
            _, badp_x = dec5_chk(jnp.asarray(inter_bad))
            flags = np.asarray(badp_x).any(axis=-1)
            if (
                not np.array_equal(np.asarray(pan_c), np.asarray(dec5_inter(inter)))
                or np.asarray(badp).any()
                or list(np.nonzero(flags)[0]) != [rbad]
            ):
                print(f"FAIL dec5[checked] R={R} round {rnd}", file=sys.stderr)
                failures += 1
        # --- k-mer MXU histogram vs scatter ---------------------------------
        from cute_nucleotides_tpu.ops import kmer

        kl = int(rng.integers(1000, 60000))
        kk = int(rng.integers(1, 9))
        ks = rng.choice(alpha, size=kl)
        kw = jnp.asarray(
            spec.u64_to_u32_pairs(oracle.n_to_bits_lut(ks)).reshape(-1)
        )
        if not np.array_equal(
            np.asarray(kmer._kmer_histogram_pallas(kw, kl, kk)),
            np.asarray(kmer._kmer_histogram_scatter(kw, kl, kk)),
        ):
            print(f"FAIL kmer L={kl} k={kk} round {rnd}", file=sys.stderr)
            failures += 1
        # --- pair planar extraction (u32-pair codes) vs the XLA gather ------
        # rotate k over a fixed set (each distinct k compiles its own kernel)
        # k=31 first: the documented gate runs --rounds 3, which with the
        # old (16, 21, 27, 31) order never compiled the production k=31
        # pair kernel on hardware (r05 review)
        kp = (31, 21, 16, 27)[rnd % 4]
        lo_p, hi_p = kmer.kmer_codes_pair(kw, kl, kp)
        want_c = np.sort(
            (np.asarray(hi_p).astype(np.uint64) << 32)
            | np.asarray(lo_p).astype(np.uint64)
        )
        glo, ghi, gcnt = map(np.asarray, kmer.kmer_counts(kw, kl, kp))
        got_c = np.repeat(
            (ghi.astype(np.uint64) << 32) | glo.astype(np.uint64), gcnt
        )
        if not np.array_equal(np.sort(got_c), want_c):
            print(f"FAIL kmer_counts L={kl} k={kp} round {rnd}", file=sys.stderr)
            failures += 1
        # --- packed pattern search: Pallas bitmask scan vs the XLA mask -----
        # query is a planted substring of this round's fresh stream (new
        # random data every round; query length rotates so each compiled
        # scan kernel shape gets re-exercised)
        from cute_nucleotides_tpu.ops import search

        qlen = (7, 19, 45)[rnd % 3]
        q = bytes(ks[100 : 100 + qlen])
        want_pos = np.flatnonzero(np.asarray(search.match_mask(kw, kl, q)))
        got_pos = search.match_positions(kw, kl, q)
        if not (np.array_equal(got_pos, want_pos) and 100 in got_pos):
            print(f"FAIL search L={kl} qlen={qlen} round {rnd}", file=sys.stderr)
            failures += 1
        # --- base-5 Pallas search scan vs the XLA mask, fresh stream ---------
        s5 = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=kl)
        w5 = jnp.asarray(
            spec.u64_to_u32_pairs(oracle.n_to_bits2_lut(s5)).reshape(-1)
        )
        q5 = bytearray(s5[100 : 100 + qlen])
        if qlen >= 5:
            q5[2] = ord("?")  # wildcard exercises the care mask
        q5 = bytes(q5)
        want5 = np.flatnonzero(np.asarray(search.match_mask_b5(w5, kl, q5)))
        got5 = search.match_positions_b5(w5, kl, q5)
        if not (np.array_equal(got5, want5) and 100 in got5):
            print(
                f"FAIL search_b5 L={kl} qlen={qlen} round {rnd}",
                file=sys.stderr,
            )
            failures += 1
        # --- minimizer Pallas scan vs the XLA windowed form, fresh stream ---
        mzw = (5, 10, 31)[rnd % 3]
        # dedicated stream ALWAYS past the Pallas routing threshold: with
        # the random kl the check was XLA-vs-XLA (vacuous) whenever
        # kl < 16384 nt (r05 review) — the kernel got no coverage
        kl_mz = kl + 16384
        s_mz = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=kl_mz)
        kw_mz = jnp.asarray(
            spec.u64_to_u32_pairs(oracle.n_to_bits_lut(s_mz)).reshape(-1)
        )
        assert kmer._route_minimizer_kernel(
            kw_mz.shape[0], kl_mz - 14, 15, mzw
        ), "minimizer check must exercise the kernel route"
        h_mz = kmer.kmer_hashes(kw_mz, kl_mz, 15)
        wm = kmer._windowed(
            h_mz, mzw - 1, jnp.minimum, jnp.uint32(0xFFFFFFFF), left=False
        )
        n_mz = h_mz.shape[0]
        wm = jnp.where(jnp.arange(n_mz) <= n_mz - mzw, wm, 0)
        want_mz = np.asarray(
            h_mz
            == kmer._windowed(wm, mzw - 1, jnp.maximum, jnp.uint32(0), left=True)
        )
        got_mz, _ = kmer.minimizers(kw_mz, kl_mz, 15, mzw)
        if not np.array_equal(np.asarray(got_mz), want_mz):
            print(f"FAIL minimizers L={kl} w={mzw} round {rnd}", file=sys.stderr)
            failures += 1
        print(
            f"round {rnd + 1}/{args.rounds} done ({time.time() - t0:.0f}s, "
            f"{failures} failures)",
            file=sys.stderr,
        )

    status = "PASS" if failures == 0 else "FAIL"
    print(f'{{"tpu_soak": "{status}", "rounds": {args.rounds}, "failures": {failures}}}')
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
