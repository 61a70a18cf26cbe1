"""Hash-keyed grouping sort for the histogram job.

The `-k` job needs GROUPING of equal 80-bit canonical keys, not
lexicographic order. Sorting by a 64-bit mix of the key words needs only
2 key operands (sort cost is per KEY operand; values ride nearly free),
with the original words carried as values so hash collisions are detected
EXACTLY (any position with hash == prev but words != prev) and the batch
can fall back to the full 3-key sort (probability ~u^2/2^65 per batch).

Measures, at 2^26 records (k=40-shaped words):
  a) 3-key (u32,u32,u16) sort                       [current hist_batch]
  b) 2-key 64-bit-hash sort + 3 carried value words + collision flag
  c) b's sort alone (no flag reduction) to price the detection
  d) full hist_batch vs hash-hist end-to-end
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench as B
from fastk_tpu.ops.count import hist_batch, bincount_by_sort, HIST_HIGH
from fastk_tpu.ops.kmers import canonical_kmers, pad_needed
from fastk_tpu.ops.count import fold_invalid, narrow_words
from fastk_tpu.ops.pack import unpack_words

SIZE = 1 << 26
K = 40


def mix64(w0, w1, w2):
    """64-bit mix of the 80-bit key (w2 is the narrowed uint16 word).

    Two independent 32-bit avalanche mixes (murmur3 finalizer constants)
    over different linear combinations of the words."""
    a = w0 * np.uint32(0x85EBCA6B) ^ (w1 * np.uint32(0xC2B2AE35)) ^ \
        (w2.astype(jnp.uint32) * np.uint32(0x27D4EB2F))
    b = w0 * np.uint32(0x165667B1) ^ (w1 * np.uint32(0x9E3779B9)) ^ \
        (w2.astype(jnp.uint32) * np.uint32(0x5851F42D))
    # avalanche each half
    a ^= a >> 16; a = a * np.uint32(0x7FEB352D); a ^= a >> 15
    a = a * np.uint32(0x846CA68B); a ^= a >> 16
    b ^= b >> 16; b = b * np.uint32(0x7FEB352D); b ^= b >> 15
    b = b * np.uint32(0x846CA68B); b ^= b >> 16
    return a, b


def main():
    total = SIZE + pad_needed(K)
    pad4 = (-total) % 16
    block, nreads, stride = B.synth_hifi_device(SIZE, B.GENOME, B.READ_LEN)
    n = int(block.shape[0])
    full = jnp.concatenate([block, jnp.full(total + pad4 - n, 4, jnp.uint8)])
    packed_host = np.asarray(jax.lax.bitcast_convert_type(
        B.pack_codes_device(full).reshape(-1, 4), jnp.uint32))
    sent = np.arange(stride - 1, n, stride, dtype=np.uint32)
    tail = np.arange(n, total, dtype=np.uint32)
    exc = np.concatenate([sent, tail])
    m = ((len(exc) + 4095) // 4096) * 4096
    exc_host = np.full(m, 0xFFFFFFFF, dtype=np.uint32)
    exc_host[: len(exc)] = exc
    excd = jnp.asarray(exc_host)
    pd = jnp.asarray(packed_host)

    @jax.jit
    def keys_only(pw, e):
        codes = unpack_words(pw, e, total)
        words, invalid = canonical_kmers(codes, K, SIZE)
        f = narrow_words(fold_invalid(words, invalid), K)
        return f

    f = jax.block_until_ready(keys_only(pd, excd))

    @jax.jit
    def sort3(f):
        s = jax.lax.sort(f, num_keys=len(f), is_stable=False)
        return s[0][-1]

    @jax.jit
    def sort_hash(f):
        h0, h1 = mix64(*f)
        inv = (f[0] == np.uint32(0xFFFFFFFF)) & \
              (f[1] == np.uint32(0xFFFFFFFF)) & (f[2] == np.uint16(0xFFFF))
        h0 = jnp.where(inv, np.uint32(0xFFFFFFFF), h0)
        h1 = jnp.where(inv, np.uint32(0xFFFFFFFF), h1)
        out = jax.lax.sort((h0, h1, *f), num_keys=2, is_stable=False)
        return out

    @jax.jit
    def sort_hash_flag(f):
        out = sort_hash(f)
        s0, s1, w0, w1, w2 = out
        hash_eq = (s0 == jnp.roll(s0, 1)) & (s1 == jnp.roll(s1, 1))
        words_ne = (w0 != jnp.roll(w0, 1)) | (w1 != jnp.roll(w1, 1)) | \
                   (w2 != jnp.roll(w2, 1))
        idx = jnp.arange(SIZE)
        coll = jnp.any(hash_eq & words_ne & (idx > 0))
        return s0[-1], coll

    @jax.jit
    def hash_hist(pw, e):
        codes = unpack_words(pw, e, total)
        words, invalid = canonical_kmers(codes, K, SIZE)
        ninv = jnp.sum(invalid.astype(jnp.int32))
        f = narrow_words(fold_invalid(words, invalid), K)
        out = sort_hash(f)
        s0, s1, w0, w1, w2 = out
        hash_eq = (s0 == jnp.roll(s0, 1)) & (s1 == jnp.roll(s1, 1))
        words_ne = (w0 != jnp.roll(w0, 1)) | (w1 != jnp.roll(w1, 1)) | \
                   (w2 != jnp.roll(w2, 1))
        idx = jnp.arange(SIZE, dtype=jnp.int32)
        coll = jnp.any(hash_eq & words_ne & (idx > 0))
        starts = (~hash_eq).at[0].set(True)
        nxt = jnp.where(starts, idx, SIZE)
        nxt_after = jnp.concatenate(
            [jax.lax.cummin(nxt[::-1])[::-1][1:],
             jnp.full((1,), SIZE, jnp.int32)])
        seg_len = nxt_after - idx
        use = starts & (idx < SIZE - ninv)
        vals = jnp.where(use, jnp.minimum(seg_len, HIST_HIGH), HIST_HIGH + 1)
        hist = bincount_by_sort(vals, HIST_HIGH + 1)
        return dict(hist=hist, nvalid=jnp.int32(SIZE) - ninv, coll=coll)

    @jax.jit
    def old_hist(pw, e):
        codes = unpack_words(pw, e, total)
        return hist_batch(codes, K, SIZE)

    def timeit(name, fn, *args, reps=5):
        fn(*args)
        jax.block_until_ready(fn(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:40s} {best*1e3:9.1f} ms", flush=True)
        return best

    timeit("a) 3-key sort (current)", sort3, f)
    timeit("c) hash 2-key sort + 3 values", lambda f: sort_hash(f)[0][-1], f)
    timeit("b) hash sort + collision flag", sort_hash_flag, f)
    o1 = old_hist(pd, excd)
    o2 = hash_hist(pd, excd)
    assert not bool(o2["coll"]), "hash collision on the bench batch?!"
    assert np.array_equal(np.asarray(o1["hist"]), np.asarray(o2["hist"])), \
        (np.abs(np.asarray(o1["hist"]) - np.asarray(o2["hist"])).sum())
    timeit("d) old hist_batch end-to-end", old_hist, pd, excd)
    timeit("e) hash hist end-to-end", hash_hist, pd, excd)


if __name__ == "__main__":
    main()
