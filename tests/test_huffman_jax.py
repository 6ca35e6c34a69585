"""In-graph Huffman build parity (ops/huffman_jax.py vs huffman/encode.py).

The on-device stage 2 builds code tables and dynamic headers in-graph; any
divergence from the host construction would silently change stream size or
(worse) emit an oversubscribed header. Pin bit-identity on adversarial and
random frequency sets, and token-stream identity for the header.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zlibng_tpu.format.constants import canonical_codes, reverse_bits
from zlibng_tpu.huffman.encode import (
    build_dynamic_header, huffman_code_lengths,
)
from zlibng_tpu.ops.huffman_jax import dyn_header, huff_table

I32 = np.int32


@pytest.fixture(scope="module")
def jitted():
    return (jax.jit(functools.partial(huff_table, max_bits=15)),
            jax.jit(functools.partial(huff_table, max_bits=7)),
            jax.jit(dyn_header))


def _freq_cases():
    rng = np.random.default_rng(42)
    cases = []
    z = np.zeros(286, np.int64)
    cases.append(z.copy())                       # empty
    o = z.copy(); o[65] = 7; cases.append(o)     # single symbol
    t = z.copy(); t[1] = 1; t[2] = 1; cases.append(t)
    cases.append(np.full(286, 3, np.int64))      # all equal
    fib = z.copy()                               # deepest legal tree
    a, b = 1, 1
    for i in range(25):
        fib[i] = a
        a, b = b, a + b
    cases.append(fib)
    pw = z.copy()
    for i in range(20):
        pw[i] = 1 << i                           # forces >15-bit overflow
    cases.append(pw)
    for _ in range(120):
        k = rng.integers(1, 286)
        f = np.zeros(286, np.int64)
        f[rng.choice(286, k, replace=False)] = rng.integers(1, 10000, k)
        cases.append(f)
    for _ in range(60):
        cases.append(rng.poisson(5, 286).astype(np.int64))
    for _ in range(60):
        f = (10000 / (1 + np.arange(286)) ** rng.uniform(0.5, 2.0))
        f = f.astype(np.int64)
        rng.shuffle(f)
        cases.append(f)
    return cases


def test_huff_table_bit_identical(jitted):
    ht15, _, _ = jitted
    for f in _freq_cases():
        hl = huffman_code_lengths(f, 15)
        hc = reverse_bits(canonical_codes(hl, 15), hl, 15)
        dl, dc = ht15(jnp.asarray(f.astype(I32)))
        assert np.array_equal(hl, np.asarray(dl)), f.nonzero()
        assert np.array_equal(hc.astype(np.int64),
                              np.asarray(dc).astype(np.int64))


def test_huff_table_bl_tree_width(jitted):
    _, ht7, _ = jitted
    rng = np.random.default_rng(9)
    for _ in range(150):
        f = rng.poisson(rng.uniform(0.3, 6), 19).astype(np.int64)
        hl = huffman_code_lengths(f, 7)
        dl, _ = ht7(jnp.asarray(f.astype(I32)))
        assert np.array_equal(hl, np.asarray(dl))


def _bits(pairs):
    out = []
    for v, nb in pairs:
        for k in range(nb):
            out.append((int(v) >> k) & 1)
    return out


def test_dyn_header_stream_identical(jitted):
    _, _, dh = jitted
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(120):
        lf = rng.poisson(rng.uniform(0.2, 30), 286).astype(np.int64)
        lf[256] = max(lf[256], 1)
        df = rng.poisson(rng.uniform(0.0, 10), 30).astype(np.int64)
        cases.append((huffman_code_lengths(lf, 15),
                      huffman_code_lengths(df, 15)))
    lf = np.zeros(286, np.int64); lf[256] = 1; lf[65] = 5
    ll = huffman_code_lengths(lf, 15)
    cases.append((ll, np.zeros(30, I32)))        # no dist codes
    df1 = np.zeros(30, np.int64); df1[0] = 3
    cases.append((ll, huffman_code_lengths(df1, 15)))
    for _ in range(60):                          # long zero runs inside
        lf = np.zeros(286, np.int64)
        lf[rng.choice(286, rng.integers(2, 20), replace=False)] = \
            rng.integers(1, 500)
        lf[256] = 1
        df = np.zeros(30, np.int64)
        df[rng.choice(30, rng.integers(0, 5), replace=False)] = 2
        cases.append((huffman_code_lengths(lf, 15),
                      huffman_code_lengths(df, 15)))
    for ll_, dl_ in cases:
        toks, hbits = build_dynamic_header(np.asarray(ll_, I32),
                                           np.asarray(dl_, I32))
        lo, nb, tot = dh(
            jnp.asarray(np.concatenate([np.asarray(ll_, I32),
                                        np.zeros(2, I32)])),
            jnp.asarray(np.asarray(dl_, I32)), jnp.int32(4))
        dev = list(zip(np.asarray(lo).tolist(), np.asarray(nb).tolist()))
        assert _bits(dev)[3:] == _bits(toks)     # skip 3-bit block header
        assert int(tot) - 3 == hbits
