import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, os, sys
import jax, jax.numpy as jnp, numpy as np
from icp_proposal_tpu.ops.closest_point import surface_distances
from icp_proposal_tpu.ops.closest_point_pallas import surface_distances_pallas

print("devices", jax.devices(), file=sys.stderr, flush=True)
rng = np.random.RandomState(0)
F, P, B = 3240, 202, 256
tri = jnp.asarray(rng.randn(F, 3, 3) * 50, jnp.float32)
q = jnp.asarray(rng.randn(B, P, 3) * 60, jnp.float32)

def timeit(f, *args, n=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

jnp_fn = jax.jit(jax.vmap(lambda qq: surface_distances(qq, tri)))
pal_fn = jax.jit(jax.vmap(lambda qq: surface_distances_pallas(qq, tri)))

t_jnp = timeit(jnp_fn, q)
print(f"jnp   : {t_jnp*1e3:.2f} ms  ({B*P*F/t_jnp/1e9:.1f} Gpairs/s)", flush=True)
t_pal = timeit(pal_fn, q)
print(f"pallas: {t_pal*1e3:.2f} ms  ({B*P*F/t_pal/1e9:.1f} Gpairs/s)", flush=True)

d_j, i_j = jnp_fn(q); d_p, i_p = pal_fn(q)
print("max d2 diff:", float(jnp.max(jnp.abs(d_j - d_p))), flush=True)
