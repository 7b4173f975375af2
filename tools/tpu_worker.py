"""Persistent TPU worker: execs /tmp/tpuq/in/*.py in arrival order.

Each job runs in a shared namespace (so state persists between jobs);
stdout/err + timing go to /tmp/tpuq/out/<name>.log.
"""
import io, os, sys, time, traceback, contextlib

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

t0 = time.time()
print(f"worker up, devices={jax.devices()}", flush=True)
x = jnp.arange(1024.0).sum()
print(f"warmup done at {time.time()-t0:.1f}s: {float(x)}", flush=True)

ns = {"jax": jax, "jnp": jnp, "np": np, "time": time}
while True:
    jobs = sorted(os.listdir("/tmp/tpuq/in"))
    if not jobs:
        time.sleep(0.5)
        continue
    name = jobs[0]
    path = os.path.join("/tmp/tpuq/in", name)
    with open(path) as f:
        code = f.read()
    os.rename(path, os.path.join("/tmp/tpuq/done", name))
    buf = io.StringIO()
    t = time.time()
    try:
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            exec(compile(code, name, "exec"), ns)
        status = "OK"
    except Exception:
        buf.write(traceback.format_exc())
        status = "ERR"
    with open(os.path.join("/tmp/tpuq/out", name + ".log"), "w") as f:
        f.write(f"[{status} {time.time()-t:.1f}s]\n" + buf.getvalue())
