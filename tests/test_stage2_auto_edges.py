"""Edge cases of the on-device stage 2 (_stage2_auto) + compact fetch.

The block partition, type choice, header build, BFINAL patch, and the
exact-offset compaction all interact at unit boundaries; these tests pin
the seams: payloads straddling unit/lane edges, stored/dyn/static mixes
inside one lane, single-unit tails, and content shifts that force
partition splits.
"""
import zlib

import numpy as np
import pytest

from zlibng_tpu.ops.deflate_tpu import (
    LANE_BLOCKS, UNIT, compress_tpu,
)


@pytest.fixture(scope="module")
def text():
    return open("/root/reference/test/data/lcet10.txt", "rb").read()


@pytest.mark.parametrize("n", [
    UNIT - 1, UNIT, UNIT + 1,                    # single-unit boundaries
    3 * UNIT + 7,                                # partial tail unit
    LANE_BLOCKS[0] + 1,                          # spills into 2nd lane size
    LANE_BLOCKS[-1] - 3, LANE_BLOCKS[-1] + 9,    # max-lane edges
])
def test_unit_and_lane_boundaries(text, n):
    data = (text * ((n // len(text)) + 1))[:n]
    c = compress_tpu(data, 6)
    assert zlib.decompress(c) == data


def test_alternating_content_forces_mixed_blocks(text):
    """text | random | text | random at unit granularity: the partition
    must split and the stream must interleave coded and stored blocks."""
    rng = np.random.default_rng(0)
    parts = []
    for i in range(10):
        if i % 2:
            parts.append(rng.integers(0, 256, UNIT, dtype=np.uint8)
                         .tobytes())
        else:
            parts.append(text[i * UNIT:(i + 1) * UNIT])
    data = b"".join(parts)
    c = compress_tpu(data, 6)
    assert zlib.decompress(c) == data
    # stored half stays ~raw, text half compresses: total well below raw
    assert len(c) < int(0.55 * 5 * UNIT) + 5 * UNIT + 512


def test_final_block_is_stored(text):
    """BFINAL handling when the stream's last unit goes stored."""
    rng = np.random.default_rng(1)
    data = text[:3 * UNIT] + rng.integers(0, 256, UNIT + 100,
                                          dtype=np.uint8).tobytes()
    c = compress_tpu(data, 6)
    assert zlib.decompress(c) == data


def test_final_block_is_coded_after_stored(text):
    """BFINAL patch lands on the final coded block's FIRST unit even when
    the block spans several units."""
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, UNIT, dtype=np.uint8).tobytes() \
        + text[:4 * UNIT]
    c = compress_tpu(data, 6)
    assert zlib.decompress(c) == data


def test_low_entropy_runs():
    """Huge byte runs: run-prepass matches + RLE-heavy dynamic headers."""
    data = (b"\x00" * 50_000 + b"ab" * 10_000 + b"\xff" * 30_000) * 3
    c = compress_tpu(data, 6)
    assert zlib.decompress(c) == data
    assert len(c) < 6_000


@pytest.mark.parametrize("seed", range(4))
def test_structured_fuzz(seed, text):
    """Random compositions of text/random/run segments at odd offsets."""
    rng = np.random.default_rng(100 + seed)
    parts = []
    total = 0
    while total < 300_000:
        kind = rng.integers(0, 3)
        ln = int(rng.integers(1, 40_000))
        if kind == 0:
            off = int(rng.integers(0, len(text) - ln)) if ln < len(text) \
                else 0
            parts.append(text[off:off + ln])
        elif kind == 1:
            parts.append(rng.integers(0, 256, ln, dtype=np.uint8).tobytes())
        else:
            parts.append(bytes([int(rng.integers(0, 256))]) * ln)
        total += len(parts[-1])
    data = b"".join(parts)
    for lvl in (1, 6):
        c = compress_tpu(data, lvl)
        assert zlib.decompress(c) == data, lvl
