"""Scan-amortized per-component profiling (launch overhead removed).

Each component is looped N times inside one jitted lax.scan with a
data dependence on the loop carry, so timings reflect on-device cost.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from icp_proposal_tpu.apps.femur import load_femur_data, make_icp_proposal_setup
from icp_proposal_tpu.sampling import mh
from icp_proposal_tpu.sampling.state import init_state, transformed_points
from icp_proposal_tpu.mesh import vertex_face_adjacency, vertex_normals_gather

B = int(os.environ.get("B", "2048"))
N = int(os.environ.get("N", "50"))
data = load_femur_data(100)
ctx, mixture, evaluator = make_icp_proposal_setup(data)
model = data.model
state0 = init_state(model)
states = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,)+x.shape), state0)
adj = jnp.asarray(vertex_face_adjacency(np.asarray(model.cells), model.num_points))


def scan_time(name, f, init_val):
    """f: x -> y with same pytree structure/shape as x (loop carry)."""
    def body(c, _):
        return f(c), None
    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=N)[0])
    out = run(init_val); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init_val); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:36s} {dt:8.3f} ms/iter   ({B} chains)", flush=True)
    return dt


# carry = states (perturb coeffs each iter to defeat CSE)
def with_decode(fn):
    def g(s):
        pts = jax.vmap(lambda si: transformed_points(model, si))(s)
        out = fn(s, pts)
        return jax.tree.map(lambda c: c + 1e-12 * out, s)
    return g

scan_time("decode only", with_decode(lambda s, p: jnp.sum(p) * 1e-30), states)

def f_normals(s, pts):
    n = jax.vmap(lambda p: vertex_normals_gather(p, model.cells, adj))(pts)
    return jnp.sum(n) * 1e-30
scan_time("decode+normals", with_decode(f_normals), states)

for i, comp in mixture.icp_components.items():
    def f_fac(s, pts, comp=comp):
        nrm = jax.vmap(lambda p: vertex_normals_gather(p, model.cells, adj))(pts)
        fac = jax.vmap(lambda si, p, nn: comp.factors(si, p, nn))(s, pts, nrm)
        return sum(jnp.sum(x) for x in jax.tree.leaves(fac)) * 1e-30
    scan_time(f"decode+normals+factors[{comp.spec.direction}]", with_decode(f_fac), states)

def f_eval(s, pts):
    lp, _ = jax.vmap(lambda si, p: evaluator(si, p))(s, pts)
    return jnp.sum(lp) * 1e-30
scan_time("decode+evaluator", with_decode(f_eval), states)

# full step in scan
step = mh.make_mh_step(model, mixture, evaluator, store_params=False)
carry = jax.jit(jax.vmap(lambda s: mh.init_carry(model, evaluator, s, mixture)))(states)
keys = jax.random.split(jax.random.PRNGKey(0), B)

def run_steps(c, k):
    def body(cc, i):
        kk = jax.vmap(lambda kj: jax.random.fold_in(kj, i))(k)
        cc, _ = jax.vmap(step)(cc, kk)
        return cc, None
    return jax.lax.scan(body, c, jnp.arange(N))[0]

runj = jax.jit(run_steps)
out = runj(carry, keys); jax.block_until_ready(out)
t0 = time.perf_counter()
out = runj(carry, keys); jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / N * 1e3
print(f"{'FULL MH STEP':36s} {dt:8.3f} ms/iter   ({B} chains)", flush=True)
