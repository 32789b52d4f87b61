import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from icp_proposal_tpu.apps.femur import load_femur_data, make_icp_proposal_setup
from icp_proposal_tpu.sampling import mh
from icp_proposal_tpu.sampling.state import init_state, transformed_points
from icp_proposal_tpu.mesh import vertex_face_adjacency, vertex_normals_gather

B = int(os.environ.get("B", "256"))
data = load_femur_data(100)
ctx, mixture, evaluator = make_icp_proposal_setup(data)
model = data.model
state0 = init_state(model)
states = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,)+x.shape), state0)
adj = jnp.asarray(vertex_face_adjacency(np.asarray(model.cells), model.num_points))

def timeit(name, f, *args, n=20):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return out

decode = jax.jit(jax.vmap(lambda s: transformed_points(model, s)))
pts = timeit("decode", decode, states)

normals_f = jax.jit(jax.vmap(lambda p: vertex_normals_gather(p, model.cells, adj)))
normals = timeit("vertex_normals", normals_f, pts)

# ICP factors per component
for i, comp in mixture.icp_components.items():
    fac_f = jax.jit(jax.vmap(lambda s, p, nn: comp.factors(s, p, nn)))
    timeit(f"icp_factors[{comp.spec.direction}]", fac_f, states, pts, normals)

ev_f = jax.jit(jax.vmap(lambda s, p: evaluator(s, p)))
timeit("evaluator", ev_f, states, pts)

step = mh.make_mh_step(model, mixture, evaluator, store_params=False)
keys = jax.random.split(jax.random.PRNGKey(0), B)
step_f = jax.jit(lambda c, k: jax.vmap(step)(c, k))
carry = jax.jit(jax.vmap(lambda s: mh.init_carry(model, evaluator, s, mixture)))(states)
timeit("full step", step_f, carry, keys)
