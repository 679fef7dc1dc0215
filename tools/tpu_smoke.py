"""Real-TPU smoke: compile and bit-exactness of every device kernel.

The pytest suite pins kernel math on a virtual CPU mesh (fast, deterministic);
this script is the real-hardware gate — it compiles every Pallas kernel and
variant on the attached TPU and asserts bit-exact parity with the NumPy
oracle plus full roundtrips.  Exits non-zero on any mismatch.

    PYTHONPATH=. python tools/tpu_smoke.py
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from cute_nucleotides_tpu import api
    from cute_nucleotides_tpu.ops import (
        distance,
        oracle,
        pallas_kernels as pk,
        seqops,
        spec,
        validate,
        xla,
    )

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)
    rng = np.random.default_rng(0xE2E)
    checks = 0

    def ok(name, cond):
        nonlocal checks
        checks += 1
        if not cond:
            print(f"FAIL: {name}", file=sys.stderr)
            sys.exit(1)
        print(f"ok: {name}", file=sys.stderr)

    # --- 2-bit kernels, all variants ----------------------------------------
    s = rng.choice(np.frombuffer(b"ACGTUacgtu", np.uint8), size=64 * 2048 * 4)
    nt4 = jnp.asarray(s.view(np.uint32).reshape(64, 2048))
    want_w = oracle.n_to_bits_lut(s)
    for variant in ("mul", "shift", "interleave"):
        packed = np.asarray(jax.jit(lambda x, v=variant: pk.encode_2bit_nt4(x, v))(nt4))
        got = spec.u32_pairs_to_u64(np.ascontiguousarray(packed.reshape(-1)).view(np.uint32))
        ok(f"pallas encode_2bit[{variant}]", np.array_equal(got, want_w))
    words_mxu = np.asarray(jax.jit(pk.encode_2bit_nt4_mxu)(nt4))
    ok(
        "pallas encode_2bit[mxu]",
        np.array_equal(
            spec.u32_pairs_to_u64(np.ascontiguousarray(words_mxu.reshape(-1))), want_w
        ),
    )
    pk_chk, bad2 = jax.jit(lambda x: pk.encode_2bit_nt4_checked(x, "mul"))(nt4)
    s_bad = s.reshape(64, -1).copy()
    s_bad[7, 123] = ord("N")  # invalid in the 2-bit alphabet
    _, bad2x = jax.jit(lambda x: pk.encode_2bit_nt4_checked(x, "mul"))(
        jnp.asarray(np.ascontiguousarray(s_bad).view(np.uint32))
    )
    flags = np.asarray(bad2x).any(axis=-1)
    ok(
        "pallas encode_2bit checked (parity + flag)",
        np.array_equal(
            spec.u32_pairs_to_u64(
                np.ascontiguousarray(np.asarray(pk_chk).reshape(-1)).view(np.uint32)
            ),
            want_w,
        )
        and not np.asarray(bad2).any()
        and list(np.nonzero(flags)[0]) == [7],
    )
    p = jnp.asarray(spec.u64_to_u32_pairs(want_w).reshape(-1).view(np.uint8).reshape(64, 2048))
    want_seq = oracle.bits_to_n_lut(want_w, s.size)
    for variant in ("swar", "shuffle", "select"):
        nt4_out = np.asarray(jax.jit(lambda x, v=variant: pk.decode_2bit_nt4(x, v))(p))
        got = np.ascontiguousarray(nt4_out.reshape(-1)).view(np.uint8)
        ok(f"pallas decode_2bit[{variant}]", np.array_equal(got, want_seq))

    # --- base-5 kernels ------------------------------------------------------
    s5 = rng.choice(np.frombuffer(b"ACGTUNacgtun", np.uint8), size=4 * pk.B5_ROW_NT)
    x5 = jnp.asarray(s5.reshape(4, pk.B5_ROW_NT))
    want5 = oracle.n_to_bits2_lut(s5)
    got5 = np.asarray(jax.jit(pk.encode_b5_panels_v2)(x5))
    ok(
        "pallas encode_b5 v2",
        np.array_equal(spec.u32_pairs_to_u64(np.ascontiguousarray(got5.reshape(-1))), want5),
    )
    chk5, bad5 = jax.jit(pk.encode_b5_panels_checked)(x5)
    s5_bad = s5.reshape(4, -1).copy()
    s5_bad[2, 17] = ord("X")
    _, bad5x = jax.jit(pk.encode_b5_panels_checked)(jnp.asarray(s5_bad))
    ok(
        "pallas encode_b5 checked (parity + flag)",
        np.array_equal(np.asarray(chk5), got5)
        and not np.asarray(bad5).any()
        and np.asarray(bad5x).any(),
    )
    lo, hi = jax.jit(pk.encode_b5_planar)(x5)
    want_seq5 = oracle.bits_to_n2_lut(want5, s5.size)
    nt4_5 = np.asarray(
        jax.jit(lambda a, b: pk.decode_b5_nt4_panels(a, b, padded=False))(lo, hi)
    )
    ok(
        "pallas decode_b5 v3 (nt4)",
        np.array_equal(np.ascontiguousarray(nt4_5.reshape(-1)).view(np.uint8), want_seq5),
    )
    u8_5 = np.asarray(jax.jit(pk.decode_b5_panels)(lo, hi))
    ok("pallas decode_b5 v1 (u8)", np.array_equal(u8_5.reshape(-1), want_seq5))
    pad_5 = np.asarray(
        jax.jit(lambda a, b: pk.decode_b5_nt4_panels(a, b, padded=True))(lo, hi)
    )
    data = np.ascontiguousarray(
        pad_5.reshape(4, 8, 112)[:, :, :108]
    ).reshape(4, 864)
    ok(
        "pallas decode_b5 nt4 padded",
        np.array_equal(
            np.ascontiguousarray(data.reshape(-1)).view(np.uint8), want_seq5
        )
        and np.all(pad_5.reshape(4, 8, 112)[:, :, 108:] == 0x41414141),
    )
    inter = jnp.asarray(np.ascontiguousarray(want5).view("<u4").reshape(4, 256))
    out_i = np.asarray(jax.jit(pk.decode_b5_interleaved_panels)(inter))
    ok(
        "pallas decode_b5 interleaved",
        np.array_equal(pk.depad_nt4_host(out_i), want_seq5),
    )
    dec5_chk = jax.jit(pk.decode_b5_interleaved_panels_checked)
    out_c, badp = dec5_chk(inter)
    inter_bad = np.asarray(inter).copy()
    inter_bad[1, 7] |= np.uint32(1) << 31     # pad bit 63 of word 3
    inter_bad[3, 0] |= np.uint32(0x7F)        # triplet 0 -> 127 (>= 125)
    _, badpx = dec5_chk(jnp.asarray(inter_bad))
    flags = np.asarray(badpx).any(axis=-1)
    ok(
        "pallas decode_b5 checked (parity + flags)",
        np.array_equal(np.asarray(out_c), out_i)
        and not np.asarray(badp).any()
        and list(np.nonzero(flags)[0]) == [1, 3],
    )

    # --- api surface (golden vectors + ragged roundtrips) --------------------
    for tier in ("oracle", "xla", "pallas"):
        w = api.n_to_bits(b"ATCG" * 8, tier=tier)
        ok(f"api golden 2bit[{tier}]", w.tolist() == [0xD8D8D8D8D8D8D8D8])
        w2 = api.n_to_bits2(b"ATCGN" * 7, tier=tier)
        ok(
            f"api golden b5[{tier}]",
            w2[0] == 0x36A45D1F46D48BA3 and w2[1] == 0x5D1F4,
        )
    for n in (1, 27, 31, 33, 12345):
        t = rng.choice(np.frombuffer(b"ACGTUNacgtun", np.uint8), size=n)
        w = api.n_to_bits2(t, tier="pallas")
        back = api.bits_to_n2(w, n, tier="pallas")
        ok(f"api b5 roundtrip n={n}", bytes(back) == bytes(t).upper().replace(b"U", b"T"))

    # --- extras ---------------------------------------------------------------
    w32 = jnp.asarray(spec.u64_to_u32_pairs(want_w).reshape(-1))
    ok(
        "gc_content_packed",
        int(seqops.gc_content_packed(w32))
        == sum(1 for c in bytes(want_seq) if c in b"CG"),
    )
    rc = np.asarray(seqops.revcomp_packed(w32, s.size))
    comp = bytes(want_seq).translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
    want_rc = oracle.n_to_bits_lut(np.frombuffer(comp, np.uint8))
    ok(
        "revcomp_packed",
        np.array_equal(spec.u32_pairs_to_u64(rc[: 2 * want_rc.size]), want_rc),
    )
    ok("validate.first_invalid", int(validate.jit_first_invalid()(jnp.asarray(
        np.frombuffer(b"ACGTXACGT", np.uint8)))) == 4)
    small = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(4, 64))
    d = np.asarray(distance.pairwise_hamming(jnp.asarray(small)))
    ok("pairwise_hamming diag", (np.diag(d) == 0).all())
    from cute_nucleotides_tpu.ops import kmer

    kl = 40000
    ks = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=kl)
    kw = jnp.asarray(spec.u64_to_u32_pairs(oracle.n_to_bits_lut(ks)).reshape(-1))
    ok(
        "kmer_histogram mxu == scatter",
        np.array_equal(
            np.asarray(kmer._kmer_histogram_pallas(kw, kl, 8)),
            np.asarray(kmer._kmer_histogram_scatter(kw, kl, 8)),
        ),
    )
    # production-k pair pipeline on hardware: planar pair extraction (new
    # Pallas kernel) + sort counting vs the ordered XLA gather tier
    lo21, hi21 = kmer.kmer_codes_pair(kw, kl, 21)
    glo, ghi, gcnt = map(np.asarray, kmer.kmer_counts(kw, kl, 21))
    from collections import Counter

    want_c = Counter(
        (int(h) << 32) | int(l)
        for l, h in zip(np.asarray(lo21).tolist(), np.asarray(hi21).tolist())
    )
    got_c = {
        (int(ghi[i]) << 32) | int(glo[i]): int(gcnt[i])
        for i in np.nonzero(gcnt)[0]
    }
    ok("kmer_counts k=21 == gather-tier Counter", got_c == dict(want_c))
    # minimizer Pallas scan (s-plane windowed min/max in VMEM) vs the pure
    # XLA windowed-pass form — kl=40000 nt is above the kernel route
    # threshold, so kmer.minimizers takes the kernel path
    def _mz_xla(words_, length_, k_, w_):
        h = kmer.kmer_hashes(words_, length_, k_)
        n = h.shape[0]
        wm = kmer._windowed(
            h, w_ - 1, jnp.minimum, jnp.uint32(0xFFFFFFFF), left=False
        )
        wm = jnp.where(jnp.arange(n) <= n - w_, wm, 0)
        return np.asarray(
            h == kmer._windowed(wm, w_ - 1, jnp.maximum, jnp.uint32(0), left=True)
        )

    assert kmer._route_minimizer_kernel(kw.size, kl - 15 + 1, 15, 10)
    mz_mask, _ = kmer.minimizers(kw, kl, 15, 10)
    ok(
        "minimizers kernel == XLA windowed",
        np.array_equal(np.asarray(mz_mask), _mz_xla(kw, kl, 15, 10)),
    )
    mz_bits = np.asarray(kmer.minimizer_bits(kw, kl, 15, 10))
    unp = ((mz_bits[:, None] >> np.arange(16)) & 1).astype(bool).reshape(-1)
    ok(
        "minimizer_bits == mask (packed contract)",
        np.array_equal(unp[: kl - 14], np.asarray(mz_mask))
        and not unp[kl - 14 :].any(),
    )
    # fused planar pair-hash kernel (canonical fold + fmix32 in VMEM) vs
    # the position-ordered gather form: same multiset
    hp = np.asarray(kmer.kmer_hashes_planar(kw, kl, 21))
    hr = np.sort(np.asarray(kmer.kmer_hashes(kw, kl, 21)))
    ok(
        "kmer_hashes_planar multiset == ordered (k=21)",
        np.array_equal(np.sort(hp[hp != 0xFFFFFFFF]), hr[hr != 0xFFFFFFFF]),
    )
    rcb5 = np.asarray(
        seqops.revcomp_packed_b5(
            jnp.asarray(spec.u64_to_u32_pairs(want5).reshape(-1)), s5.size
        )
    )
    comp5 = bytes(want_seq5).translate(bytes.maketrans(b"ACGTN", b"TGCAN"))[::-1]
    want_rc5 = oracle.n_to_bits2_lut(np.frombuffer(comp5, np.uint8))
    ok(
        "revcomp_packed_b5",
        np.array_equal(spec.u32_pairs_to_u64(rcb5), want_rc5),
    )
    # GC count on the packed base-5 stream (new Pallas kernel: MXU
    # gather-fold triplet extraction + parity shortcut) — call the kernel
    # directly so the Mosaic lowering is exercised regardless of the
    # seqops routing threshold
    gc5 = int(
        pk.gc_content_b5_stream_pallas(
            jnp.asarray(spec.u64_to_u32_pairs(want5).reshape(-1))
        )
    )
    ok(
        "gc_content_b5_pallas",
        gc5 == sum(1 for c in bytes(want_seq5) if c in b"CG"),
    )
    # pattern search: the Pallas packed-bitmask scan (new kernel) vs the
    # XLA mask tier, wildcard + multi-word query, on the 40 knt stream
    from cute_nucleotides_tpu.ops import search

    for q in (b"GATTACA", b"ANNTG", bytes(ks[1000:1000 + 45])):
        mask = np.flatnonzero(np.asarray(search.match_mask(kw, kl, q)))
        got_pos = search.match_positions(kw, kl, q)
        ok(
            f"search match_bits vs mask ({len(q)} nt)",
            np.array_equal(got_pos, mask),
        )
    ok(
        "search planted multiword hit",
        1000 in search.match_positions(kw, kl, bytes(ks[1000:1000 + 45])),
    )
    # base-5 search: the r04 Pallas scan (MXU de-interleave + phase folds)
    # vs the XLA mask tier, on a 2-row + ragged-tail interleaved stream;
    # query mixes literal N with the ? wildcard and lands on all 3 phases
    s5l = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=29000)
    for p in (1, 13824 - 3, 29000 - 7):
        s5l[p : p + 7] = np.frombuffer(b"GATNACA", np.uint8)
    w5l = jnp.asarray(
        spec.u64_to_u32_pairs(oracle.n_to_bits2_lut(s5l)).reshape(-1)
    )
    for q in (b"GAT?ACA", b"GATNACA", bytes(s5l[2000:2045])):
        want_b5 = np.flatnonzero(
            np.asarray(search.match_mask_b5(w5l, s5l.size, q))
        )
        got_b5 = search.match_positions_b5(w5l, s5l.size, q)
        ok(
            f"search_b5 kernel vs mask ({len(q)} nt)",
            np.array_equal(got_b5, want_b5) and len(want_b5) >= 1,
        )
    # Myers edit distance (XLA scan tier): multi-block ragged batch vs the
    # DP oracle — validates the u32 carry/shift chain's TPU lowering
    from cute_nucleotides_tpu.ops import align

    al_q = [bytes(ks[100:100 + 70]), bytes(ks[0:33]), bytes(ks[500:564])]
    al_t = [bytes(ks[90:240]), bytes(ks[300:340]), bytes(ks[500:564])]
    aql = np.array([len(s) for s in al_q], np.int32)
    atl = np.array([len(s) for s in al_t], np.int32)

    def _pack_rows(seqs, width):
        out = np.zeros((len(seqs), width), np.uint32)
        for i, s in enumerate(seqs):
            v = spec.u64_to_u32_pairs(
                oracle.n_to_bits_lut(np.frombuffer(s, np.uint8))
            ).reshape(-1)
            out[i, : v.size] = v
        return out

    aqw = _pack_rows(al_q, 6)
    atw = _pack_rows(al_t, 10)
    got_ed = np.asarray(
        align.edit_distance_packed(
            jnp.asarray(aqw), jnp.asarray(aql), jnp.asarray(atw),
            jnp.asarray(atl),
        )
    )
    want_ed = [
        align.edit_distance_reference(q, t) for q, t in zip(al_q, al_t)
    ]
    ok("edit_distance_packed vs DP oracle", list(got_ed) == want_ed)
    bm_d, bm_e = align.best_match_packed(
        jnp.asarray(aqw), jnp.asarray(aql), jnp.asarray(atw), jnp.asarray(atl)
    )
    want_bm = [align.best_match_reference(q, t) for q, t in zip(al_q, al_t)]
    ok(
        "best_match_packed vs DP oracle",
        [(int(d), int(e)) for d, e in zip(bm_d, bm_e)] == want_bm,
    )

    print(f"TPU SMOKE PASS ({checks} checks)", file=sys.stderr)
    print('{"tpu_smoke": "PASS", "checks": %d}' % checks)
    return 0


if __name__ == "__main__":
    sys.exit(main())
