"""Long-lived TPU job worker.

The axon TPU tunnel takes minutes to connect per process, so interactive TPU
work runs through this single persistent process: drop ``NNN_name.py`` files
into /tmp/tpu_jobs/ and the worker execs them in-process (shared namespace —
jit caches persist across jobs), writing stdout/stderr + traceback to
``NNN_name.out`` and a ``NNN_name.done`` marker.
"""

import io
import os
import sys
import time
import traceback
from contextlib import redirect_stderr, redirect_stdout

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)
sys.path.insert(0, "/root/repo")

print("importing jax...", flush=True)
t0 = time.time()
import jax  # noqa: E402

print(f"jax ready in {time.time()-t0:.0f}s: {jax.devices()}", flush=True)

# Persistent compilation cache: worker re-execs (after backend errors)
# would otherwise recompile the ~4-minute frame executables from scratch.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("compilation cache at /tmp/jax_cache", flush=True)
except Exception as e:  # cache unsupported on this backend: fine
    print(f"no compilation cache: {e}", flush=True)

NAMESPACE: dict = {"jax": jax}
# survive re-exec: anything with a .done marker is already processed
done = {f[:-5] + ".py" for f in os.listdir(JOBS) if f.endswith(".done")}
while True:
    jobs = sorted(f for f in os.listdir(JOBS)
                  if f.endswith(".py") and f not in done)
    for j in jobs:
        done.add(j)
        path = os.path.join(JOBS, j)
        out_path = path[:-3] + ".out"
        print(f"running {j}", flush=True)
        buf = io.StringIO()
        try:
            # Pick up repo edits: drop cached framework modules (jit caches
            # for unchanged code survive via in-memory XLA caches anyway).
            for mod in [m for m in sys.modules if m.startswith("kanirenderer_tpu")]:
                del sys.modules[mod]
            with redirect_stdout(buf), redirect_stderr(buf):
                src = open(path).read()
                exec(compile(src, path, "exec"), NAMESPACE)
        except BaseException:
            buf.write("\n" + traceback.format_exc())
        text = buf.getvalue()
        with open(out_path, "w") as f:
            f.write(text)
        open(path[:-3] + ".done", "w").close()
        print(f"finished {j}", flush=True)
        if "TPU backend error" in text or "JaxRuntimeError" in text:
            # A failed execution poisons the device/tunnel state for the
            # whole process — re-exec to reconnect cleanly.
            print("backend error detected; re-exec for a clean device",
                  flush=True)
            os.execv(sys.executable, [sys.executable, __file__])
    time.sleep(1.0)
