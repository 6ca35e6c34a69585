"""Generated-table sanity: fixed trees, length/dist code maps, CRC tables."""
import numpy as np
import zlib

from zlibng_tpu.format import constants as C


def test_length_tables():
    assert C.LENGTH_BASE[0] == 3
    assert C.LENGTH_BASE[27] == 227
    assert C.LENGTH_BASE[28] == 258
    assert list(C.LENGTH_EXTRA[:8]) == [0] * 8
    assert C.LENGTH_EXTRA[27] == 5
    # every length 3..258 maps to a code whose range contains it
    for length in range(3, 259):
        code = int(C.length_to_code(length))
        assert 257 <= code <= 285
        i = code - 257
        base = C.LENGTH_BASE[i]
        span = 1 << C.LENGTH_EXTRA[i]
        if length == 258:
            assert code == 285
        else:
            assert base <= length < base + span


def test_dist_tables():
    assert C.DIST_BASE[0] == 1
    assert C.DIST_BASE[29] == 24577
    for dist in [1, 2, 3, 4, 5, 6, 7, 8, 100, 256, 257, 1000, 4096, 24576, 24577, 32768]:
        code = int(C.dist_to_code(dist))
        base = C.DIST_BASE[code]
        span = 1 << C.DIST_EXTRA[code]
        assert base <= dist < base + span, (dist, code)


def test_fixed_trees_rfc1951():
    ll = C.FIXED_LIT_LENGTHS
    assert (ll[:144] == 8).all() and (ll[144:256] == 9).all()
    assert (ll[256:280] == 7).all() and (ll[280:] == 8).all()
    # RFC 1951 fixed-code anchor values
    assert C.FIXED_LIT_CODES[0] == 0b00110000
    assert C.FIXED_LIT_CODES[143] == 0b10111111
    assert C.FIXED_LIT_CODES[144] == 0b110010000
    assert C.FIXED_LIT_CODES[256] == 0
    assert C.FIXED_LIT_CODES[280] == 0b11000000
    assert (C.FIXED_DIST_LENGTHS == 5).all()
    assert C.FIXED_DIST_CODES[5] == 5


def test_canonical_codes_prefix_free():
    lengths = np.array([3, 3, 3, 3, 3, 2, 4, 4])
    codes = C.canonical_codes(lengths)
    # prefix-freeness: no code is a prefix of another
    items = [(int(c), int(l)) for c, l in zip(codes, lengths)]
    for i, (ci, li) in enumerate(items):
        for j, (cj, lj) in enumerate(items):
            if i != j and li <= lj:
                assert (cj >> (lj - li)) != ci


def test_reverse_bits():
    codes = np.array([0b110, 0b001, 0b1], dtype=np.uint32)
    lengths = np.array([3, 3, 1])
    rev = C.reverse_bits(codes, lengths)
    assert list(rev) == [0b011, 0b100, 0b1]


def test_crc_table_matches_zlib_single_bytes():
    from zlibng_tpu.checksum.crc32 import crc32
    for b in range(256):
        assert crc32(bytes([b])) == zlib.crc32(bytes([b]))


def test_limit_lengths_kraft_exact_regression():
    """Oversubscribed-tree regression: this frequency vector (captured from
    lcet10 text at level 1, unit group 23) builds an unlimited Huffman tree
    of depth 17; the reference-style node-count overflow loop (trees.c
    gen_bitlen overflow -= 2) under-removes for depth > max_bits+1 and
    emitted a Kraft-oversubscribed — undecodable — literal/lengths set."""
    import os
    import numpy as np
    from zlibng_tpu.huffman.encode import huffman_code_lengths

    freq = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                                "oversub_freq.npy"))
    lens = huffman_code_lengths(freq, 15)
    assert lens.max() <= 15
    kraft = sum(1 << (15 - int(l)) for l in lens if l)
    assert kraft == 1 << 15


def test_limit_lengths_kraft_exact_stress():
    """Skewed distributions (fibonacci/zipf) force maximal-depth trees;
    every limited table must be exactly complete (decodable by inflate)."""
    import numpy as np
    from zlibng_tpu.huffman.encode import huffman_code_lengths

    rng = np.random.default_rng(7)
    for trial in range(400):
        n = int(rng.integers(2, 286))
        f = np.zeros(n, np.int64)
        kind = trial % 3
        if kind == 0:
            f[:] = rng.integers(1, 1000, n)
        elif kind == 1:
            a, b = 1, 1
            for i in range(n):
                f[i] = a
                a, b = b, min(a + b, 10 ** 12)
        else:
            f[:] = rng.zipf(1.2, n).clip(1, 10 ** 9)
        f[rng.random(n) < 0.3] = 0
        if (f > 0).sum() < 2:
            continue
        lens = huffman_code_lengths(f, 15)
        assert lens.max() <= 15
        kraft = sum(1 << (15 - int(l)) for l in lens if l)
        assert kraft == 1 << 15, trial
