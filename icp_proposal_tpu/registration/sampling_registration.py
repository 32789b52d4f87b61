"""The probabilistic-registration chain driver.

Equivalent of reference ``api/sampling/SamplingRegistration.scala:37-94``
(``runfitting``): runs the MH chain, streams accept/reject records to the
JSON log, reports acceptance statistics and current best-fit surface error at
intervals, and returns the best (MAP-under-product) sample.

TPU-native structure: the chain runs in jit-compiled *segments* (``lax.scan``
over steps inside one device call, ``vmap`` over chains), with exactly one
device→host transfer per segment for logging — the reference's per-step
callbacks become batched ring-buffer drains (SURVEY §2.4 MH row).
"""
from __future__ import annotations

import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from icp_proposal_tpu.mesh import TriangleMesh
from icp_proposal_tpu.registration.comparison import evaluate_reconstruction_boundary_aware
from icp_proposal_tpu.sampling import loggers, mh
from icp_proposal_tpu.sampling.evaluators import EvaluatorProgram
from icp_proposal_tpu.sampling.proposals import MixtureProgram
from icp_proposal_tpu.sampling.state import FitState, init_state, transformed_mesh


@dataclass
class FittingResult:
    best_state: FitState
    best_log_value: float
    final_states: FitState  # batched over chains
    json_records: list  # chain 0's records in reference schema
    acceptance: dict
    samples_per_sec: float
    records: object = field(default=None, repr=False)  # full stacked ChainRecord


class SamplingRegistration:
    """Drives MH fitting for one model/target configuration."""

    def __init__(
        self,
        gpmm,
        target: TriangleMesh,
        mixture: MixtureProgram,
        evaluator: EvaluatorProgram,
        accept_info_interval: int = 1000,
        verbose: bool = True,
    ):
        self.gpmm = gpmm
        self.target = target
        self.mixture = mixture
        self.evaluator = evaluator
        self.accept_info_interval = accept_info_interval
        self.verbose = verbose
        self._step = mh.make_mh_step(gpmm, mixture, evaluator, store_params=True)

    def runfitting(
        self,
        num_samples: int,
        key=None,
        initial_state: Optional[FitState] = None,
        n_chains: int = 1,
        json_path: Optional[str] = None,
        segment_size: Optional[int] = None,
        resume_log: Optional[str] = None,
        resume_mode: str = "best",
    ) -> FittingResult:
        """Run the MH fitting.

        resume_log/resume_mode: restart the chain(s) from a previous run's
        JSON log — "best" re-seeds from the MAP record (reference usage of
        ``getBestFittingParsFromJSON``), "last" continues from the last
        accepted state.  An explicit ``initial_state`` wins over resume_log.
        """
        key = key if key is not None else jax.random.PRNGKey(1024)
        if initial_state is None and resume_log is not None:
            initial_state = loggers.state_from_log(
                loggers.load_log(resume_log), mode=resume_mode
            )
            if self.verbose:
                print(f"[resume] starting from {resume_mode} record of {resume_log}")
        state0 = initial_state if initial_state is not None else init_state(self.gpmm)
        if jax.tree.leaves(state0)[0].ndim == 0 or state0.coeffs.ndim == 1:
            carry0 = jax.jit(
                lambda s: mh.init_carry(self.gpmm, self.evaluator, s, self.mixture)
            )(state0)
            carry0 = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape), carry0
            )
        else:  # already batched initial states
            carry0 = jax.jit(jax.vmap(lambda s: mh.init_carry(self.gpmm, self.evaluator, s, self.mixture)))(
                state0
            )
            n_chains = state0.coeffs.shape[0]

        segment = segment_size or min(num_samples, self.accept_info_interval)
        chain_keys = jax.random.split(key, n_chains)

        # Pipelined segment loop: `run_chains` dispatches asynchronously, so
        # the next segment's device work is enqueued BEFORE the previous
        # segment's records are pulled to host.  Device→host transfer + JSON
        # assembly run on a drain thread, overlapping the device compute —
        # the reference's per-step logger callbacks become fully off the
        # timed path (SURVEY §2.4 MH row; VERDICT r1 "driver-throughput").
        drain_pool = ThreadPoolExecutor(max_workers=1)

        def drain(dev_records, start_index):
            rec = jax.tree.map(np.asarray, dev_records)
            jl = loggers.records_to_json_list(
                jax.tree.map(lambda x: x[0], rec),
                self.evaluator.named_keys,
                self.mixture.names,
                start_index=start_index,
            )
            acc = (
                loggers.acceptance_summary(
                    jax.tree.map(lambda x: x[0], rec), self.mixture.names
                )
                if self.verbose
                else None
            )
            return rec, jl, acc

        all_records = []
        json_records = []
        t_start = time.time()
        done = 0
        carry = carry0
        seg_idx = 0
        pending: deque = deque()
        reported = 0

        def pop_one():
            nonlocal reported
            rec, jl, acc = pending.popleft().result()
            all_records.append(rec)
            json_records.extend(jl)
            reported += rec.accepted.shape[1]
            if self.verbose:
                elapsed = time.time() - t_start
                rate = reported * n_chains / max(elapsed, 1e-9)
                print(
                    f"[{reported}/{num_samples}] chains={n_chains} "
                    f"accept={acc['overall']:.3f} samples/s={rate:.1f}"
                )

        while done < num_samples:
            n = min(segment, num_samples - done)
            seg_keys = jax.vmap(
                lambda k: jax.random.fold_in(k, seg_idx)
            )(chain_keys)
            carry, dev_records = mh.run_chains(self._step, carry, seg_keys, n)
            pending.append(drain_pool.submit(drain, dev_records, done))
            done += n
            seg_idx += 1
            # bound in-flight segments (device memory for stacked records)
            while len(pending) > 2:
                pop_one()
        while pending:
            pop_one()
        # include the final device sync + drain in the wall-clock
        jax.block_until_ready(carry.state.coeffs)
        drain_pool.shutdown(wait=True)

        elapsed = time.time() - t_start
        records = jax.tree.map(
            lambda *xs: np.concatenate(xs, axis=1), *all_records
        )
        if json_path is not None:
            loggers.write_log(json_path, json_records)

        # best sample (MAP under product) across ALL chains — the
        # BestSampleLogger equivalent (reference :56-58, 91-92)
        best_state, best_val = self._extract_best(records)
        acceptance = loggers.acceptance_summary(
            jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), records),
            self.mixture.names,
        )
        if self.verbose:
            best_mesh = transformed_mesh(self.gpmm, best_state)
            from icp_proposal_tpu.mesh import boundary_vertex_mask

            gt_mask = jnp.asarray(
                boundary_vertex_mask(
                    np.asarray(self.target.cells), self.target.num_points
                )
            )
            evaluate_reconstruction_boundary_aware(
                "Sampling", best_mesh, self.target, gt_mask
            )

        return FittingResult(
            best_state=best_state,
            best_log_value=best_val,
            final_states=carry.state,
            json_records=json_records,
            acceptance=acceptance,
            samples_per_sec=done * n_chains / max(elapsed, 1e-9),
            records=records,
        )

    def _extract_best(self, records):
        acc = np.asarray(records.accepted)  # [C, T]
        if not acc.any():
            # argmax over all -inf would silently return step-0 garbage;
            # fail loudly like loggers.best_fitting_record (reference
            # getBestFittingParsFromJSON semantics, JSONAcceptRejectLogger.scala:142-146)
            raise ValueError(
                "no accepted sample in any chain — cannot extract a best "
                "(MAP) state; run longer or loosen the evaluator"
            )
        logv = np.where(acc, np.asarray(records.log_product), -np.inf)
        c, t = np.unravel_index(np.argmax(logv), logv.shape)
        coeffs = jnp.asarray(records.coeffs[c, t])
        pose = np.asarray(records.pose[c, t])
        state = FitState(
            scale=jnp.asarray(1.0, jnp.float32),
            trans=jnp.asarray(pose[0:3], jnp.float32),
            rot=jnp.asarray(pose[3:6], jnp.float32),
            center=jnp.asarray(pose[6:9], jnp.float32),
            coeffs=coeffs,
        )
        return state, float(logv[c, t])
