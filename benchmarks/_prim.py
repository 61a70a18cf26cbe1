"""Time one post-sort primitive on device (data generated on device)."""
import sys, time, numpy as np, jax, jax.numpy as jnp
SIZE = 1 << 26
which = sys.argv[1]

def timeit(name, fn, *args, n=3):
    fn(*args)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); out = fn(*args); float(out)
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts)) - 0.052
    print(f"{name:42s} {t*1e3:9.1f} ms")

key = jax.random.PRNGKey(0)
lens = jax.random.randint(key, (SIZE,), 0, 60, dtype=jnp.int32)
starts = jax.random.bernoulli(key, 0.1, (SIZE,))

if which == "roll":
    timeit("roll-compare", jax.jit(lambda w: jnp.sum((w != jnp.roll(w,1)).astype(jnp.int32))), lens)
elif which == "cumsum":
    timeit("cumsum 64M", jax.jit(lambda x: jax.lax.cumsum(x)[-1]), lens)
elif which == "cummax":
    timeit("cummax 64M", jax.jit(lambda x: jax.lax.cummax(x)[-1]), lens)
elif which == "scatter32k":
    timeit("scatter-add 64M->32k", jax.jit(lambda x: jnp.zeros(32768, jnp.int32).at[x & 32767].add(1)[0]), lens)
elif which == "scatterperm":
    perm = jax.lax.sort((jax.random.randint(key,(SIZE,),0,1<<30,dtype=jnp.int32), jnp.arange(SIZE,dtype=jnp.int32)), num_keys=1)[1]
    timeit("scatter-set 64M perm", jax.jit(lambda x, p: jnp.zeros(SIZE, jnp.int32).at[p].set(x)[-1]), lens, perm)
elif which == "gatherperm":
    perm = jax.lax.sort((jax.random.randint(key,(SIZE,),0,1<<30,dtype=jnp.int32), jnp.arange(SIZE,dtype=jnp.int32)), num_keys=1)[1]
    timeit("gather 64M perm", jax.jit(lambda x, p: x[p][-1]), lens, perm)
elif which == "compact":
    timeit("compaction sort 1bit+idx", jax.jit(lambda s: jax.lax.sort(((~s).astype(jnp.uint8), jnp.arange(SIZE, dtype=jnp.int32)), num_keys=1, is_stable=True)[1][::65536].astype(jnp.int32).sum()), starts)
elif which == "sort1":
    timeit("sort int32 1key", jax.jit(lambda x: jax.lax.sort((x,), num_keys=1)[0][::65536].sum()), lens)
elif which == "searchsorted":
    sl = jax.lax.sort((lens,), num_keys=1)[0]
    timeit("searchsorted 32k in 64M", jax.jit(lambda x: jnp.searchsorted(x, jnp.arange(32768)).sum()), sl)
