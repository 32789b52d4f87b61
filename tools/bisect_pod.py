import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from icp_proposal_tpu.apps.femur import load_femur_data, make_icp_proposal_setup
from icp_proposal_tpu.apps.femur_experiments import _batched_init_states
from icp_proposal_tpu.sampling import mh

def t(msg, t0): print(f"{msg}: {time.perf_counter()-t0:.1f}s", flush=True)

t0=time.perf_counter(); data = load_femur_data(50); t("load", t0)
t0=time.perf_counter(); ctx, mixture, evaluator = make_icp_proposal_setup(data); t("setup", t0)
sp = os.environ.get("STORE", "1") == "1"
step = mh.make_mh_step(data.model, mixture, evaluator, store_params=sp)
t0=time.perf_counter()
states = _batched_init_states(data.model, 64, jax.random.PRNGKey(0))
jax.block_until_ready(states); t("init states", t0)
t0=time.perf_counter()
carries = jax.jit(jax.vmap(lambda s: mh.init_carry(data.model, evaluator, s, mixture)))(states)
jax.block_until_ready(carries); t("init carries", t0)
keys = jax.random.split(jax.random.PRNGKey(1), 64)
t0=time.perf_counter()
final, records = mh.run_chains(step, carries, keys, 50)
jax.block_until_ready(final); t(f"run (store_params={sp})", t0)
