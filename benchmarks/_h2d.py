import sys, time, numpy as np, jax, jax.numpy as jnp
which = sys.argv[1]
a8 = np.zeros(1<<24, dtype=np.uint8)  # calloc: cheap to read
def h2d(name, arr, n=2):
    d = jnp.asarray(arr); float(jnp.sum(d.ravel()[:2].astype(jnp.float32)))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter()
        d = jnp.asarray(arr); float(jnp.sum(d.ravel()[:2].astype(jnp.float32)))
        ts.append(time.perf_counter()-t0)
    t=np.median(ts); mb=arr.nbytes/1e6
    print(f"{name:28s} {t*1e3:8.1f} ms  {mb/t:7.1f} MB/s", flush=True)
if which == "u8": h2d("uint8 1D 16MB", a8)
elif which == "i32": h2d("int32 1D 16MB", a8.view(np.int32))
elif which == "i32_2d": h2d("int32 2D 16MB", a8.view(np.int32).reshape(4096,1024))
elif which == "f32_2d": h2d("float32 2D 16MB", a8.view(np.float32).reshape(4096,1024))
elif which == "u8small": h2d("uint8 1D 2MB", a8[:1<<21])
