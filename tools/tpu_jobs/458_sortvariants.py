import gc, time
gc.collect(); jax.clear_caches(); gc.collect()
# Raw lax.sort cost shapes at bicycle-scale K: stable vs unstable, and
# operand-count scaling — decides whether num_keys=2 unstable can replace
# the stable fused-key sort.
K = 25_925_632
key = jax.random.bits(jax.random.PRNGKey(0), (K,), jnp.uint32)
splat = jax.random.randint(jax.random.PRNGKey(1), (K,), 0, 6_100_000, jnp.int32)
pay = [jax.random.bits(jax.random.PRNGKey(i), (K,), jnp.uint32) for i in range(2, 7)]
key, splat, *pay = jax.block_until_ready((key, splat, *pay))

def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)
    del o; gc.collect()

timeit("stable 7-op", lambda k, s, *p: jax.lax.sort((k, s) + p, num_keys=1, is_stable=True), key, splat, *pay)
timeit("unstable 7-op (1 key)", lambda k, s, *p: jax.lax.sort((k, s) + p, num_keys=1, is_stable=False), key, splat, *pay)
timeit("unstable 7-op (2 keys)", lambda k, s, *p: jax.lax.sort((k, s) + p, num_keys=2, is_stable=False), key, splat, *pay)
timeit("stable 2-op", lambda k, s: jax.lax.sort((k, s), num_keys=1, is_stable=True), key, splat)
timeit("unstable 2-op", lambda k, s: jax.lax.sort((k, s), num_keys=1, is_stable=False), key, splat)
del key, splat, pay; gc.collect(); jax.clear_caches(); gc.collect()
print("458 done", flush=True)
