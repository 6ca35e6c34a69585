"""Adler-32 checksum: vectorized computation + exact parallel combine.

Capability parity with reference adler32.c / adler32_p.h / adler32_fold_c.c
(zng_adler32, zng_adler32_z, zng_adler32_combine). The implementation is
array-first: per-chunk (sum, weighted-sum) partial reductions merged with the
closed-form combine — the same math that makes sharded checksumming exact
(reference adler32.c:32-55) — rather than a byte loop.
"""
from __future__ import annotations

import numpy as np

from ..format.constants import ADLER_BASE, ADLER_NMAX

_BASE = ADLER_BASE


def adler32(data, value: int = 1) -> int:
    """Adler-32 of `data` (bytes or uint8 ndarray), seeded with `value`."""
    try:                      # compiled host runtime (native/zng_host.c)
        from .. import native
        if native.available():
            return native.adler32(data, value)
    except Exception:
        pass
    buf = np.frombuffer(memoryview(data), dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data.astype(np.uint8, copy=False)
    s1 = np.uint64(value & 0xFFFF)
    s2 = np.uint64((value >> 16) & 0xFFFF)
    n = buf.size
    if n == 0:
        # zlib reduces the seed parts even for empty input
        s1 %= np.uint64(_BASE)
        s2 %= np.uint64(_BASE)
        return int((s2 << np.uint64(16)) | s1)
    # Blocked so the weighted sum stays in uint64 comfortably; NMAX blocking
    # matches the reference's overflow bound (adler32_p.h:11-13).
    # With uint64 accumulators we can use much larger blocks than NMAX.
    block = ADLER_NMAX * 256
    for start in range(0, n, block):
        chunk = buf[start:start + block].astype(np.uint64)
        m = chunk.size
        csum = chunk.sum()
        # weights m, m-1, ..., 1 applied to chunk bytes
        wsum = (chunk * np.arange(m, 0, -1, dtype=np.uint64)).sum()
        s2 = (s2 + np.uint64(m) * s1 + wsum) % np.uint64(_BASE)
        s1 = (s1 + csum) % np.uint64(_BASE)
    return int((s2 << np.uint64(16)) | s1)


def adler32_combine(adler1: int, adler2: int, len2: int) -> int:
    """Combine adler32(A) and adler32(B) into adler32(A||B), |B| = len2.

    Closed-form merge (reference adler32.c:32-55): the second checksum's
    running s2 gains len2 copies of the first stream's s1 (minus the
    duplicated initial 1).
    """
    rem = len2 % _BASE
    s1a = adler1 & 0xFFFF
    s2a = (adler1 >> 16) & 0xFFFF
    s1b = adler2 & 0xFFFF
    s2b = (adler2 >> 16) & 0xFFFF
    s1 = (s1a + s1b + _BASE - 1) % _BASE
    s2 = (s2a + s2b + rem * s1a + _BASE - rem) % _BASE
    return (s2 << 16) | s1


def adler32_partials(chunks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-chunk (adler, length) partials for a (num_chunks, chunk_len) array.

    Each row is checksummed independently (seed 1); merge with
    `adler32_combine` reduction. This is the host-side mirror of the sharded
    TPU reduction in ops/checksum_jax.py.
    """
    chunks = chunks.astype(np.uint64)
    m = chunks.shape[1]
    s1 = (1 + chunks.sum(axis=1)) % _BASE
    w = np.arange(m, 0, -1, dtype=np.uint64)
    s2 = (m + (chunks * w).sum(axis=1)) % _BASE
    return ((s2 << np.uint64(16)) | s1).astype(np.uint32), m
