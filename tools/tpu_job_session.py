"""Long-lived TPU session: one backend init / device grant, jobs run
in-process from a spool dir (/tmp/tpu_jobs/NN_name.py, lexicographic)."""
import os
import sys
import time
import traceback
import runpy

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

t0 = time.time()
print("session probe:", float(jnp.sum(jnp.ones((64, 64)))),
      f"({time.time() - t0:.1f}s)", time.ctime(), flush=True)

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)
while True:
    jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
    if not jobs:
        time.sleep(5)
        continue
    j = jobs[0]
    path = os.path.join(JOBS, j)
    print(f"=== job {j} start {time.ctime()}", flush=True)
    t0 = time.time()
    try:
        runpy.run_path(path, run_name="__main__")
    except SystemExit:
        pass
    except BaseException:
        traceback.print_exc()
    os.rename(path, path + ".done")
    print(f"=== job {j} end {time.ctime()} ({time.time() - t0:.0f}s)",
          flush=True)
    jax.clear_caches()
