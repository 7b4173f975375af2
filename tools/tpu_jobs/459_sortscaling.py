import gc, time
gc.collect(); jax.clear_caches(); gc.collect()
# Sort-cost scaling laws at bench scale, deciding the round-3 sort attack:
# (a) operand-count curve (is it really ~31 ms/operand, and does unstable
#     change the slope?);
# (b) batched row sorts (B, K/B) vs flat (K,): the bucket-prepass payoff IF
#     cheap bucketing existed — bounds the value of any partition scheme;
# (c) K-scaling at fixed operands (super/sub-linearity).
K = 25_925_632

def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    del o; gc.collect()

def mk(k, nops):
    key = jax.random.bits(jax.random.PRNGKey(0), (k,), jnp.uint32)
    pay = [jax.random.bits(jax.random.PRNGKey(i + 2), (k,), jnp.uint32) for i in range(nops)]
    return jax.block_until_ready((key, *pay))

# (a) operand curve, unstable (grouping sorts don't need stability).
for nops in (0, 1, 3, 5):
    ops = mk(K, nops)
    timeit(f"unstable 1+{nops}op K", lambda *o: jax.lax.sort(o, num_keys=1, is_stable=False), *ops)
    del ops; gc.collect()

# (b) batched rows: same total elements, 64 independent row sorts.
for b in (8, 64):
    ops = mk(K, 3)
    ops2 = tuple(o.reshape(b, K // b) for o in ops)
    ops2 = jax.block_until_ready(ops2)
    del ops
    timeit(f"unstable 1+3op batched ({b}, K/{b})", lambda *o: jax.lax.sort(o, num_keys=1, is_stable=False, dimension=1), *ops2)
    del ops2; gc.collect()

# (c) K-scaling, 1+3 operands.
for k in (K // 4, K // 2, K):
    ops = mk(k, 3)
    timeit(f"unstable 1+3op K={k}", lambda *o: jax.lax.sort(o, num_keys=1, is_stable=False), *ops)
    del ops; gc.collect()

jax.clear_caches(); gc.collect()
print("459 done", flush=True)
