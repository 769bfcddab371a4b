import sys; sys.path.insert(0, "/root/repo")
import time, json
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mjlab")

def timeit(name, fn, args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({name: round((time.perf_counter()-t0)/n*1000, 2)}), flush=True)

for nargs in (10, 100, 500, 1500):
    args = [jnp.ones((8,), jnp.float32) * i for i in range(nargs)]
    f = jax.jit(lambda *xs: sum(xs))
    timeit(f"sum_{nargs}_args_ms", f, args)

# large output count
for nouts in (10, 100, 500):
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda v, n=nouts: tuple(v + i for i in range(n)))
    timeit(f"out_{nouts}_ms", f, [x])

# big total payload single arg
for mb in (8, 32, 128, 256):
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)
    f = jax.jit(lambda v: v * 2.0)
    timeit(f"payload_{mb}MB_ms", f, [x])
