"""Per-stage TPU timing harness with forced synchronization.

On the axon tunnel, block_until_ready can return before remote compute
finishes; the only reliable sync is fetching a value. Every timed call
reduces its outputs to a scalar and fetches it.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from zlibng_tpu.ops import lz77_jax as L
from zlibng_tpu.ops import bitpack_jax as BP
from zlibng_tpu.ops.deflate_tpu import LANE, HMAX, OUT_BUCKETS
OUT_MAX = OUT_BUCKETS[-1]
from zlibng_tpu.format.constants import (
    FIXED_DIST_CODES_REV, FIXED_DIST_LENGTHS, FIXED_LIT_CODES_REV,
    FIXED_LIT_LENGTHS,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

text = open("/root/reference/test/data/lcet10.txt", "rb").read() * 8
lanes = np.zeros((B, LANE), np.uint8)
for i in range(B):
    lanes[i] = np.frombuffer(text[i * 65536:i * 65536 + LANE], np.uint8)
lanes_d = jnp.asarray(lanes)


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum() if hasattr(
        jax.tree.leaves(out)[0], 'sum') else 0)  # force
    best = 1e9
    for _ in range(reps):
        t = time.perf_counter()
        out = fn(*args)
        # force full materialization of every output
        s = sum(float(x.sum()) for x in jax.tree.leaves(out))
        best = min(best, time.perf_counter() - t)
    mbps = B * 65536 / best / 1e6
    print(f"{name:32s}: {best*1e3:8.1f} ms   {mbps:8.1f} MB/s", flush=True)
    return out


# stage pieces
hash_sort = jax.jit(jax.vmap(lambda d: jnp.argsort(L._hash4(d), stable=True)))
timed("hash+argsort", hash_sort, lanes_d)

full = jax.jit(jax.vmap(lambda d: L.lz77_lane(
    d, jnp.int32(32768), jnp.int32(LANE), jnp.int32(0), 8, True, 16, 128)))
core = timed("lz77_lane chain=8", full, lanes_d)

from zlibng_tpu.ops.parse_pallas import parse_select
bounds = jnp.asarray(np.tile(np.array([32768, LANE], np.int32), (B, 1)))
sel = timed("parse_select", jax.jit(parse_select), core["step"], bounds)

fin = jax.jit(L.finalize_tokens)
outs = timed("finalize_tokens", fin, lanes_d, core, sel)

freqs = jax.jit(jax.vmap(lambda a, b, c, d: L.lane_freqs(a, b, c, d)))
timed("lane_freqs", freqs, outs["lsym"], outs["dsym"], outs["sel"],
      outs["tok_len"] > 0)

lt = jnp.asarray(np.tile(FIXED_LIT_LENGTHS.astype(np.int32), (B, 1)))
lcd = jnp.asarray(np.tile(FIXED_LIT_CODES_REV.astype(np.int32), (B, 1)))
dt = jnp.asarray(np.tile(FIXED_DIST_LENGTHS.astype(np.int32), (B, 1)))
dcd = jnp.asarray(np.tile(FIXED_DIST_CODES_REV.astype(np.int32), (B, 1)))

render = jax.jit(jax.vmap(lambda a, b, c, d, e, f, g, h, i: BP.render_body_tokens(
    a, b, c, d, e, f, g, h, i)))
toks = timed("render_body_tokens", render, outs["tok_len"], outs["tok_dist"],
             outs["lsym"], outs["dsym"], outs["sel"], lt, lcd, dt, dcd)

from zlibng_tpu.ops.bitpack_merge import hierarchical_pack
pack = jax.jit(jax.vmap(lambda a, b, c: hierarchical_pack(a, b, c, OUT_MAX)))
timed("hierarchical_pack", pack, *toks)
print("done", flush=True)
