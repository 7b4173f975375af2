"""r5 training-convergence artifact (VERDICT r4 #3).

Runs examples/train_full.py --preset r5 IN-PROCESS on the chip: 24 train
views + 4 held-out @800x500, 3000 steps, densify until 2500, opacity reset
at 1500, pallas backend with all bench pack knobs, PSNR-vs-step curve.
Writes docs/train_demo_r5.json.
"""
import gc
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")
for m in list(sys.modules):
    if m.startswith("unitygaussiansplatting_tpu") or m == "train_full":
        sys.modules.pop(m)

import jax
import train_full

t0 = time.time()
trained, hist = train_full.main([
    "--preset", "r5",
    "--out-dir", "/tmp/tpu_splat_train_r5",
    "--out-json", "/root/repo/docs/train_demo_r5.json",
])
print(f"928 total {time.time() - t0:.0f}s", flush=True)
del trained, hist
gc.collect(); jax.clear_caches(); gc.collect()
print("928 done", flush=True)
