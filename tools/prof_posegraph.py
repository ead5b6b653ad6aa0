import os, time
os.makedirs(os.path.expanduser("~/.cache/jax_compcache"), exist_ok=True)
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_compcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")
from bench import build_posegraph_20k
from svin_tpu.parallel.pcg import _pg4_gn_step_pcg, _pg4_eval, optimize_4dof_pcg

nodes, edges, N = build_posegraph_20k()

def timeit(f, *a, iters=5, warmup=2):
    for _ in range(warmup):
        out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

fixb = jnp.int32(1)
ev = jax.jit(lambda nd: _pg4_eval(nd, edges, nd.valid))
print(f"edge eval: {timeit(ev, nodes)*1e3:.2f} ms  (E={edges.i.shape[0]})")

for cg, group in ((0, 64), (1, 64), (16, 64), (64, 64)):
    f = jax.jit(lambda nd, cg=cg, g=group: _pg4_gn_step_pcg(
        nd, edges, fixb, N, cg, coarse_group=g)[0])
    print(f"gn_step cg={cg} group={group}: {timeit(f, nodes)*1e3:.2f} ms")
