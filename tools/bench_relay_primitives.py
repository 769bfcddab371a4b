import sys; sys.path.insert(0, "/root/repo")
import os, time, json
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mjlab")

T, B, F = 24, 4096, 300
buf = jnp.zeros((T, B, F), dtype=jnp.float32)
x = jnp.ones((B, F), dtype=jnp.float32)
t = jnp.uint32(3)

def timeit(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({name: round((time.perf_counter()-t0)/n*1000, 2)}), flush=True)
    return out

# 1. dynamic_update_slice into big buffer
dus = jax.jit(lambda b, v, i: b.at[i].set(v))
timeit("dus_big_ms", dus, buf, x, t)

# 2. static-index update
static_set = jax.jit(lambda b, v: b.at[3].set(v))
timeit("static_set_ms", static_set, buf, x)

# 3. one-hot where write
def onehot_write(b, v, i):
    mask = (jnp.arange(T) == i)[:, None, None]
    return jnp.where(mask, v[None], b)
timeit("onehot_where_ms", jax.jit(onehot_write), buf, x, t)

# 4. concatenate 24 slices inside jit
parts = [jnp.ones((1, B, F), dtype=jnp.float32) for _ in range(T)]
timeit("concat24_ms", jax.jit(lambda *ps: jnp.concatenate(ps, 0)), *parts)

# 5. stack 24 inside jit
parts2 = [jnp.ones((B, F), dtype=jnp.float32) for _ in range(T)]
timeit("stack24_ms", jax.jit(lambda *ps: jnp.stack(ps, 0)), *parts2)

# 6. big elementwise for reference
timeit("elementwise_big_ms", jax.jit(lambda b: b * 2.0 + 1.0), buf)

# 7. tiny scan for reference
def body(c, _):
    return c * 1.0001, jnp.sum(c)
timeit("scan24_matmul_ms", jax.jit(lambda v: jax.lax.scan(body, v, None, length=24)), x)
