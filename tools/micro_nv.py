import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from icp_proposal_tpu.ops.closest_point_pallas import nearest_vertices_pallas
print("devices", jax.devices(), file=sys.stderr, flush=True)
rng = np.random.RandomState(0)
B, P, V = 256, 202, 1622
pts = jnp.asarray(rng.randn(B, V, 3) * 50, jnp.float32)   # batched current meshes
q = jnp.asarray(rng.randn(B, P, 3) * 60, jnp.float32)
fn = jax.jit(jax.vmap(nearest_vertices_pallas))
t0=time.perf_counter(); out = fn(q, pts); jax.block_until_ready(out)
print("compile+run", time.perf_counter()-t0, flush=True)
t0=time.perf_counter()
for _ in range(10): out = fn(q, pts)
jax.block_until_ready(out)
print("per-call ms", (time.perf_counter()-t0)/10*1e3, flush=True)
# correctness spot check
d2 = jnp.sum((q[0][:,None]-pts[0][None])**2, -1)
ref = jnp.argmin(d2, 1)
print("match:", bool(jnp.all(out[0]==ref)), flush=True)
