"""Generate round-5 TPU-worker jobs (phase 1: multichip scaling inputs).

Each job pins EVERY KANI_* knob explicitly (os.environ leaks between
worker jobs) and ends with a sentinel line containing "TPU backend error"
so the worker re-execs — one heavyweight executable per process, per the
tunneled-runtime rules (docs/PERFORMANCE.md)."""

import os
import sys

JOBS = "/tmp/tpu_jobs"

PROLOGUE = '''\
import os, sys
os.environ.update({
 "KANI_TILE_H": "32", "KANI_TILE_W": "128", "KANI_SHADOW_TILE_H": "32",
 "KANI_CHUNK_SIZE": "128", "KANI_NBUF": "4", "KANI_SUBBATCH": "16",
 "KANI_RUN_CHUNKS": "4", "KANI_BIN": "stream", "KANI_TOURN": "run",
 "KANI_OCC": "shadow", "KANI_OCC_PERIOD": "1", "KANI_OCC_STRIP": "0",
 "KANI_FUSED_PHASE": "full", "KANI_EVAL_NOP": "0", "KANI_P2": "lut",
 "KANI_P2LUT": "lut", "KANI_SUBBATCH_SKIP": "1", "KANI_MASK_PRUNE": "1",
 "KANI_PACK_SORT": "1", "KANI_RUNCF": "1", "KANI_WINPF": "1",
 "KANI_EVAL_LOOP": "0", "KANI_REC_BUILD": "planarT"})
os.environ.pop("KANI_CLIPFREE", None)
for _m in [m for m in list(sys.modules)
           if m.startswith("scripts") or m == "bench_lib"]:
    del sys.modules[_m]
if "/root/repo/scripts" not in sys.path:
    sys.path.insert(0, "/root/repo/scripts")
import bench_lib
import json
'''

SENTINEL = ('\nprint("SESSION-END sentinel: TPU backend error '
            '(forced re-exec for a clean process)")\n')


def write(name: str, body: str, reexec: bool = True) -> None:
    path = os.path.join(JOBS, name + ".py")
    with open(path, "w") as f:
        f.write(PROLOGUE + body + (SENTINEL if reexec else "\n"))
    print("queued", path)


def main(which: str) -> None:
    os.makedirs(JOBS, exist_ok=True)
    if which == "phase1":
        write("r5_001_steady_full", '''
med = bench_lib.steady_bench(passes=3, label="full-1080p-anchor")
print(json.dumps({"job": "steady_full_a", "fps": med, "ms": 1000/med}))
''')
        write("r5_002_fresh_full", '''
med = bench_lib.fresh_bench(passes=3, label="full-1080p-anchor")
print(json.dumps({"job": "fresh_full_a", "fps": med, "ms": 1000/med}))
''')
        write("r5_003_band540_steady", '''
out = bench_lib.band_bench(540, passes=3, label="steady")
print(json.dumps({"job": "band540_steady", "ms_per_band": out}))
''')
        write("r5_004_band270_steady", '''
out = bench_lib.band_bench(270, passes=3, label="steady")
print(json.dumps({"job": "band270_steady", "ms_per_band": out}))
''')
        write("r5_005_band540_fresh", '''
out = bench_lib.band_bench(540, passes=3, label="fresh", fresh=True)
print(json.dumps({"job": "band540_fresh", "ms_per_band": out}))
''')
        write("r5_006_shadow_full", '''
out = bench_lib.shadow_band_bench(1, passes=3, label="full")
# build_shadow_table standalone (small program): the per-chip PCF-table
# build every fresh frame pays, replicated on every chip of a mesh.
import time
import jax
import jax.numpy as jnp
import numpy as np
from kanirenderer_tpu.ops.sampling import build_shadow_table
mp = jax.device_put(np.random.rand(2048, 2048).astype(np.float32))
tb = jax.jit(build_shadow_table)
tb(mp).block_until_ready()
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    for _ in range(10):
        r = tb(mp)
    r.block_until_ready()
    ts.append((time.perf_counter() - t0) / 10 * 1000)
ts.sort()
print(json.dumps({"job": "shadow_full", "ms_per_band": out,
                  "table_build_ms": round(ts[len(ts)//2], 2)}))
''')
        write("r5_007_shadow_band2", '''
out = bench_lib.shadow_band_bench(2, passes=3, label="2band")
print(json.dumps({"job": "shadow_band2", "ms_per_band": out}))
''')
        write("r5_008_shadow_band4", '''
out = bench_lib.shadow_band_bench(4, passes=3, label="4band")
print(json.dumps({"job": "shadow_band4", "ms_per_band": out}))
''')
        write("r5_009_steady_full_b", '''
med = bench_lib.steady_bench(passes=3, label="full-1080p-anchor-b")
print(json.dumps({"job": "steady_full_b", "fps": med, "ms": 1000/med}))
''')
    else:
        raise SystemExit(f"unknown phase {which!r}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "phase1")
