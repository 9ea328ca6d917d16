"""The r10 Arrow simhash-packing kernel must be bit-identical to the
original 64-fold JVM formulation. The reference below re-implements
that fold literally (per (p, b): sum over hashes of
((digit >> (3-b)) & 1) * 2 - 1, bit = contrib > 0, bits packed with
two's-complement shiftleft wrap), and the kernel is checked against
it over random hash sets including the edge cases (empty set, single
hash, all-identical hashes, exact-tie contributions at even n)."""

from __future__ import annotations

import hashlib
import random

import pandas as pd

from email_etl_spark.plans.dedup import _simhash_pack_kernel


def _reference_pack(hs: list[str]) -> list[int]:
    bits = []
    for p in range(16):
        for b in range(4):
            contrib = 0
            for h in hs:
                digit = int(h[p], 16)
                contrib += ((digit >> (3 - b)) & 1) * 2 - 1
            bits.append(1 if contrib > 0 else 0)
    blks = []
    sig = 0
    for blk in range(4):
        blk_int = 0
        for j in range(16):
            blk_int += bits[16 * blk + j] << (15 - j)
        blks.append(blk_int)
        sig += blk_int << (16 * (3 - blk))
    # JVM shiftleft on BIGINT wraps two's-complement
    if sig >= 1 << 63:
        sig -= 1 << 64
    return [sig] + blks


def _rand_hashes(rng: random.Random, n: int) -> list[str]:
    return [hashlib.md5(f"{rng.random()}".encode()).hexdigest()[:16] for _ in range(n)]


def test_kernel_matches_reference_fold():
    rng = random.Random(7)
    cases = [[], ["0123456789abcdef"], ["ffffffffffffffff"] * 5]
    for n in (1, 2, 3, 4, 7, 16, 33, 200):
        cases.append(_rand_hashes(rng, n))
    # adversarial: duplicate hashes so per-bit contributions tie at 0
    # (even n, half-and-half) — the `> 0` boundary must agree
    cases.append(["0000000000000000", "ffffffffffffffff"])
    cases.append(["00ff00ff00ff00ff", "ff00ff00ff00ff00"] * 3)
    got = list(_simhash_pack_kernel(pd.Series(cases)))
    for hs, g in zip(cases, got):
        if len(hs) == 0:
            assert list(g) == [0, 0, 0, 0, 0]
            continue
        assert list(g) == _reference_pack(hs), hs


def test_kernel_blocks_are_sig_slices():
    rng = random.Random(11)
    for n in (1, 9, 64):
        hs = _rand_hashes(rng, n)
        sig, *blks = list(_simhash_pack_kernel(pd.Series([hs])))[0]
        sig_u = sig + (1 << 64) if sig < 0 else sig
        for b in range(4):
            assert blks[b] == (sig_u >> (16 * (3 - b))) & 0xFFFF
