"""Device (TPU) checksum kernels: adler32 and crc32 over JAX arrays.

TPU-native re-expression of the reference SIMD checksum families
(adler32_avx2.c dot-product with descending weights + NMAX blocking;
crc32_pclmulqdq folding / crc32_braid ILP):

  adler32: per-chunk (sum, weighted-sum) uint32 reductions + exact mod-tree
           merge; zero padding is removed algebraically on the host via the
           adler32_combine closed form.
  crc32  : chunk-local slicing-by-8 lax.scan (table gathers vectorized across
           chunk lanes) + log-depth GF(2) matrix tree combine across chunks —
           the combine matrices are crc32_combine_gen operators (§2.7), the
           same machinery that merges per-chip CRCs across a mesh. Zero
           padding is removed by inverting the GF(2) shift operator.

All device arithmetic is uint32 (TPU-native width); no x64 required.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..format.constants import ADLER_BASE, CRC_TABLES
from ..checksum.crc32 import _gf2_matrix_times, _shift_operator

_BASE = np.uint32(ADLER_BASE)

# chunk length for both kernels (bytes); power of two, multiple of 8
CHUNK = 1024


# ---------------------------------------------------------------------------
# adler32
# ---------------------------------------------------------------------------
def _mod_tree_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of values < BASE, reduced mod BASE pairwise (no uint32 overflow)."""
    while x.shape[0] > 1:
        half = (x.shape[0] + 1) // 2
        x = jnp.pad(x, (0, 2 * half - x.shape[0]))
        x = (x[:half] + x[half:]) % _BASE
    return x[0]


@jax.jit
def _adler32_device(chunks: jnp.ndarray) -> jnp.ndarray:
    """chunks: (C, CHUNK) uint8 (zero-padded). Returns adler over the padded
    stream as uint32 (s2<<16 | s1)."""
    C = chunks.shape[0]
    b = chunks.astype(jnp.uint32)
    csum = b.sum(axis=1) % _BASE                             # (C,)
    w = jnp.uint32(CHUNK) - jnp.arange(CHUNK, dtype=jnp.uint32)
    wsum = (b * w[None, :]).sum(axis=1) % _BASE              # ≤255*CHUNK²/2 <2^31
    # chunk c's bytes carry extra weight (bytes after chunk) in total s2
    offs = jnp.arange(C, dtype=jnp.uint32) * jnp.uint32(CHUNK)
    trailing = (jnp.uint32(C * CHUNK) - offs - jnp.uint32(CHUNK)) % _BASE
    t = (wsum + (csum * trailing) % _BASE) % _BASE
    s1 = (jnp.uint32(1) + _mod_tree_sum(csum)) % _BASE
    s2 = (_mod_tree_sum(t) + jnp.uint32((C * CHUNK) % int(ADLER_BASE))) % _BASE
    return (s2 << jnp.uint32(16)) | s1


def adler32_jax(data, value: int = 1) -> int:
    """Adler-32 on device. `data` may be bytes or a uint8 array."""
    arr = jnp.asarray(np.frombuffer(memoryview(data), np.uint8)
                      if isinstance(data, (bytes, bytearray, memoryview))
                      else data, dtype=jnp.uint8)
    n = int(arr.shape[0])
    if n == 0:
        padded_adler = 1
        pad = 0
    else:
        c = -(-n // CHUNK)
        padded = jnp.zeros((c * CHUNK,), jnp.uint8).at[:n].set(arr)
        pad = c * CHUNK - n
        padded_adler = int(_adler32_device(padded.reshape(c, CHUNK)))
    # algebraic unpad: appending `pad` zeros leaves s1 and adds rem*s1 to s2
    s1 = padded_adler & 0xFFFF
    s2 = (padded_adler >> 16) & 0xFFFF
    rem = pad % int(ADLER_BASE)
    s2 = (s2 - rem * s1) % int(ADLER_BASE)
    a = (s2 << 16) | s1
    if value != 1:
        from ..checksum.adler32 import adler32_combine
        return adler32_combine(value, a, n)
    return a


# ---------------------------------------------------------------------------
# crc32
# ---------------------------------------------------------------------------
_CRC_T = jnp.asarray(CRC_TABLES.astype(np.uint32))  # (8, 256)


def _apply_mat(mat: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """GF(2) matrix (32 column vectors) times each lane of v (uint32).
    fori_loop keeps the graph small (compile-light on slow hosts)."""
    def body(i, acc):
        bit = (v >> jnp.uint32(i)) & jnp.uint32(1)
        return acc ^ (mat[i] * bit)
    return jax.lax.fori_loop(0, 32, body, jnp.zeros_like(v))


@functools.partial(jax.jit, static_argnames=("levels",))
def _crc32_device(chunks: jnp.ndarray, shift_mats: jnp.ndarray, levels: int):
    """chunks: (C=2^levels, CHUNK) uint8. Returns finalized crc (uint32) of
    the concatenated padded stream.

    Gather-free: per 4-byte word, crc' = M₄(crc ^ word) where M₄ (advance by
    4 zero bytes) is applied as 32 conditional XORs — pure VPU arithmetic,
    no table lookups (TPU gathers are slow). Chunk lanes run data-parallel;
    cross-chunk merge is a log-depth GF(2) matrix tree (PCLMUL-fold analog).
    """
    C = chunks.shape[0]
    b = chunks.reshape(C, CHUNK // 4, 4).astype(jnp.uint32)
    words = b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16) | (b[:, :, 3] << 24)
    m4 = shift_mats[-1]  # (32,) advance-4-zero-bytes operator

    def step(crc, w):
        return _apply_mat(m4, crc ^ w), None

    init = jnp.full((C,), jnp.uint32(0xFFFFFFFF))
    crcs, _ = jax.lax.scan(step, init, jnp.swapaxes(words, 0, 1))
    crcs = crcs ^ jnp.uint32(0xFFFFFFFF)   # finalized per-chunk CRCs

    # log-depth combine: crc(A||B) = M_{|B|}·crc(A) ^ crc(B)
    c = crcs
    for k in range(levels):
        c = _apply_mat(shift_mats[k], c[0::2]) ^ c[1::2]
    return c[0]


@functools.lru_cache(maxsize=64)
def _combine_matrices(levels: int) -> jnp.ndarray:
    """Rows 0..levels-1: advance by CHUNK*2^k zero bytes (tree combine);
    last row: advance by 4 zero bytes (the per-word step matrix M₄)."""
    mats = np.zeros((max(levels, 1) + 1, 32), dtype=np.uint32)
    for k in range(levels):
        mats[k] = _shift_operator(CHUNK << k).astype(np.uint32)
    mats[-1] = _shift_operator(4).astype(np.uint32)
    return jnp.asarray(mats)


def _crc_zeros(pad: int) -> int:
    """Finalized CRC of `pad` zero bytes: register shift of the init value."""
    reg = _gf2_matrix_times(_shift_operator(pad), 0xFFFFFFFF)
    return reg ^ 0xFFFFFFFF


def _invert_gf2_mat(m: np.ndarray) -> np.ndarray:
    """Invert a GF(2) 32x32 matrix stored as 32 column vectors (uint64)."""
    rows = np.zeros(32, dtype=np.uint64)
    irows = np.zeros(32, dtype=np.uint64)
    for r in range(32):
        for c in range(32):
            rows[r] |= ((np.uint64(m[c]) >> np.uint64(r)) & np.uint64(1)) << np.uint64(c)
        irows[r] = np.uint64(1) << np.uint64(r)
    for col in range(32):
        piv = col
        while not (rows[piv] >> np.uint64(col)) & np.uint64(1):
            piv += 1
        rows[[col, piv]] = rows[[piv, col]]
        irows[[col, piv]] = irows[[piv, col]]
        for r in range(32):
            if r != col and ((rows[r] >> np.uint64(col)) & np.uint64(1)):
                rows[r] ^= rows[col]
                irows[r] ^= irows[col]
    out = np.zeros(32, dtype=np.uint64)
    for c in range(32):
        for r in range(32):
            out[c] |= ((irows[r] >> np.uint64(c)) & np.uint64(1)) << np.uint64(r)
    return out


@functools.lru_cache(maxsize=4096)
def _unpad_ops(pad: int):
    return _invert_gf2_mat(_shift_operator(pad)), _crc_zeros(pad)


def _unpad_crc(crc_padded: int, pad: int) -> int:
    """Given finalized crc(data || Z_pad), recover crc(data):
    crc(A||Z) = M_pad·crc(A) ^ crc(Z)  ⇒  crc(A) = M⁻¹·(crc(A||Z) ^ crc(Z))."""
    if pad == 0:
        return crc_padded
    inv, z = _unpad_ops(pad)
    return _gf2_matrix_times(inv, crc_padded ^ z)


def crc32_jax(data, value: int = 0) -> int:
    """CRC-32 on device (chunk-parallel scan + GF(2) tree combine)."""
    arr = jnp.asarray(np.frombuffer(memoryview(data), np.uint8)
                      if isinstance(data, (bytes, bytearray, memoryview))
                      else data, dtype=jnp.uint8)
    n = int(arr.shape[0])
    if n == 0:
        return value
    c = -(-n // CHUNK)
    c_pow = 1 << (c - 1).bit_length()
    padded = jnp.zeros((c_pow * CHUNK,), jnp.uint8).at[:n].set(arr)
    levels = c_pow.bit_length() - 1
    raw = int(_crc32_device(padded.reshape(c_pow, CHUNK),
                            _combine_matrices(levels), levels))
    crc = _unpad_crc(raw, c_pow * CHUNK - n)
    if value != 0:
        from ..checksum.crc32 import crc32_combine
        return crc32_combine(value, crc, n)
    return crc
