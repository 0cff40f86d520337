"""Trainers: the general training loop, the single-node variant, and the
flocking imitation-learning trainer with DAGger.

Re-designs of ``alegnn/modules/training.py``:
  * Trainer (:29-578): minibatch loop with uneven last batch, per-epoch
    shuffle, validation every `validationInterval` steps, best-on-validation
    checkpointing, optional StepLR-style decay and early-stopping lag.
  * TrainerSingleNode (:580-714): forward through singleNodeForward with
    per-sample target ids (MovieLens).
  * TrainerFlocking (:716-1696): imitation of the expert controller with
    optional DAGger ('fixedBatch' | 'randomEpoch' | 'replaceTimeBatch').

The train step is a single jitted value_and_grad + optax update; data stays
in numpy between steps (host) and crosses to device per batch.

Scan dispatch: at reference scale (N ~ 1e2) a train step is microseconds of
device work behind milliseconds of dispatch + the per-step host sync on
``float(loss)`` — on a TPU behind a network tunnel that round-trip is ~6 ms
and dominates training wall-clock. The trainers therefore group the steps
between two validation points into ONE dispatch: a ``lax.scan`` over the
stacked batches that carries (params, opt_state) and returns the per-step
losses, synced to host once per run. Semantics are unchanged — same batch
order, same RNG key sequence, same validation/checkpoint/early-stop cadence
(runs never cross a validation point, an epoch boundary, or a batch-size
change; the uneven last batch runs as its own step) — and the per-batch
host paths (fixedBatch/replaceTimeBatch DAGger) automatically fall back to
step-by-step. Disable with ``scanDispatch=False``; an int caps the run
length; ``scanMemoryBudget`` (bytes, default 1 GiB) caps the stacked batch
data shipped per dispatch.
"""

from __future__ import annotations

import time as _time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

import inspect

from graph_neural_networks_tpu.utils.misc import append_jsonl


def _accepts_rng(fn) -> bool:
    try:
        return "rng" in inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False


def _batch_bounds(n_train: int, batch_size) -> list:
    """Batch index bounds with uneven last batch
    (reference training.py:176-200)."""
    if isinstance(batch_size, int):
        if n_train < batch_size:
            sizes = [n_train]
        else:
            n_batches = np.ceil(n_train / batch_size).astype(int)
            sizes = [batch_size] * n_batches
            if sum(sizes) != n_train:
                sizes[-1] = n_train - sum(sizes[:-1])
    else:
        sizes = list(batch_size)
    return [0] + list(np.cumsum(sizes))


class Trainer:

    def __init__(self, model, data, nEpochs: int, batchSize: int, **kwargs):
        self.model = model
        self.data = data
        self.nEpochs = nEpochs
        self.batchSize = batchSize
        self.validationInterval = kwargs.get("validationInterval",
                                             max(data.nTrain // batchSize, 1))
        self.printInterval = kwargs.get("printInterval", 0)
        self.doPrint = self.printInterval > 0
        self.earlyStoppingLag = kwargs.get("earlyStoppingLag", 0)
        self.doEarlyStopping = self.earlyStoppingLag > 0
        self.learningRateDecayRate = kwargs.get("learningRateDecayRate")
        self.learningRateDecayPeriod = kwargs.get("learningRateDecayPeriod")
        self.doSaveVars = kwargs.get("doSaveVars", False)
        self.metricsFile = kwargs.get("metricsFile")
        self.logger = kwargs.get("logger")  # utils.visual.Visualizer
        self.resume = kwargs.get("resume", False)
        # True = scan the steps between validation points into one
        # dispatch; an int caps the run length; False = step-by-step.
        # Default "auto" = on for accelerators (the TPU tunnel's ~6 ms
        # per-step dispatch is the motivating case), off on CPU where
        # dispatch is cheap and the scan program's extra compile loses
        # end-to-end on short runs (bench_scan_dispatch_cpu.json: 1.10x
        # steady-state but 0.87x with compile on a 20-epoch run).
        self.scanDispatch = kwargs.get("scanDispatch", "auto")
        if self.scanDispatch == "auto":
            self.scanDispatch = jax.default_backend() != "cpu"
        self.scanMemoryBudget = kwargs.get("scanMemoryBudget", 1 << 30)
        self._step_nbytes = {}  # per-batch-size device bytes of one step
        # mesh=jax.sharding.Mesh -> data-parallel training: batch args
        # sharded over `meshAxis`, params/opt replicated; GSPMD inserts
        # the gradient all-reduce. Identical math to single-device (the
        # batch-mean loss just reduces across shards), so trajectories
        # match. Batches not divisible by the axis size run replicated.
        self.mesh = kwargs.get("mesh")
        self.meshAxis = kwargs.get("meshAxis",
                                   self.mesh.axis_names[0]
                                   if self.mesh is not None else None)
        # precision='bf16': mixed-precision training — master params and
        # optimizer state stay f32, the forward/backward runs in bf16
        # (params, batch, AND the GSO cast at the jit boundary, so the
        # shift einsums ride the MXU's bf16 path). Loss reduces in f32.
        # bf16's f32-sized exponent needs no loss scaling.
        self.precision = kwargs.get("precision")
        assert self.precision in (None, "f32", "bf16"), self.precision
        self.rng = np.random.default_rng(kwargs.get("seed", 0))
        self._key = jax.random.PRNGKey(kwargs.get("seed", 0))
        # stochastic forwards (GRNN z0 ~ N(0,1) per call) get a fresh key
        self._needs_rng = _accepts_rng(model.archit.split_forward)
        self._build_step()

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- forward plumbing (overridden by subclasses) -----------------------
    def _forward(self, params, x, aux, key=None):
        if self._needs_rng:
            key = jax.random.PRNGKey(0) if key is None else key
            return self.model.archit.split_forward(params, x, rng=key)[0]
        return self.model.archit.split_forward(params, x)[0]

    def _train_batch_data(self, idx):
        """Returns (x, y, aux) for the given indices."""
        x, y = self.data.getSamples("train", idx)
        return x, y, None

    def _valid_data(self):
        x, y = self.data.getSamples("valid")
        return x, y, None

    def _valid_cost(self, params):
        x, y, aux = self._valid_data()
        yHat = self._forward(params, jnp.asarray(x, jnp.float32), aux)
        return float(self.data.evaluate(np.asarray(yHat), y))

    def _mixed(self, params, *arrays):
        """Cast params + batch pytrees to the compute precision (bf16
        mixed precision); identity otherwise. Integer leaves (labels,
        ELL indices) are untouched."""
        if self.precision != "bf16":
            return (params,) + arrays
        cast = lambda a: (a.astype(jnp.bfloat16)
                          if (hasattr(a, "dtype")
                              and jnp.issubdtype(a.dtype, jnp.floating))
                          else a)
        return tuple(jax.tree_util.tree_map(cast, t)
                     for t in (params,) + arrays)

    # -- jitted step -------------------------------------------------------
    def _build_step(self):
        loss_fn = self.model.loss
        optimizer = self.model.optimizer

        def step(params, opt_state, x, y, aux, key):
            def objective(p):
                pc, xc = self._mixed(p, x)
                yHat = self._forward(pc, xc, aux, key)
                return loss_fn(yHat.astype(jnp.float32), y)
            loss, grads = jax.value_and_grad(objective)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._finalize_step(step)

    def _finalize_step(self, step):
        """Install the per-step update and its scan-over-steps form. Every
        ``_build_step`` ends here so optimizer rebuilds refresh both."""
        self._step_fn = step
        self._step = jax.jit(step)

        def scan_fn(params, opt_state, xs, ys, auxs, keys):
            def body(carry, inp):
                x, y, aux, key = inp
                p, o, loss = step(carry[0], carry[1], x, y, aux, key)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (xs, ys, auxs, keys))
            return params, opt_state, losses

        self._scan = jax.jit(scan_fn)

    def _scan_eligible(self) -> bool:
        """Whether runs of steps may be scanned into one dispatch (no
        per-batch host work). Overridden by TrainerFlocking."""
        return True

    def _shard_batch(self, args, batch_axis: int):
        """Data-parallel placement: shard every batched leaf of (x, y,
        aux) over the mesh's data axis (GSPMD partitions the whole step
        from the argument shardings). Falls back to replicated when the
        batch doesn't divide the axis (e.g. the uneven last batch)."""
        if self.mesh is None:
            return args
        from jax.sharding import NamedSharding, PartitionSpec
        n_shards = self.mesh.shape[self.meshAxis]

        def put(a):
            if a.ndim <= batch_axis or a.shape[batch_axis] % n_shards:
                return jax.device_put(
                    a, NamedSharding(self.mesh, PartitionSpec()))
            spec = [None] * a.ndim
            spec[batch_axis] = self.meshAxis
            return jax.device_put(
                a, NamedSharding(self.mesh, PartitionSpec(*spec)))

        return jax.tree_util.tree_map(put, args)

    def _replicate_state(self):
        if self.mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec
        repl = NamedSharding(self.mesh, PartitionSpec())
        self.model.params = jax.device_put(self.model.params, repl)
        self.model.opt_state = jax.device_put(self.model.opt_state, repl)

    def _step_args(self, idx):
        """Device-ready (x, y, aux) for one batch — the exact operands
        ``_step`` receives (shared by the per-step and scanned paths)."""
        x, y, aux = self._train_batch_data(idx)
        return jnp.asarray(x, jnp.float32), jnp.asarray(y), aux

    def _run_length(self, epoch: int, batch: int, bounds, n_batches: int):
        """Steps to scan in one dispatch starting at `batch`: capped by the
        epoch end, a batch-size change (the uneven last batch), the next
        validation point (inclusive — validation must see the params right
        after that step), and an int scanDispatch."""
        if not self.scanDispatch or not self._scan_eligible():
            return 1
        L_max = n_batches - batch
        if self.scanDispatch is not True:  # int cap (True is an int!)
            L_max = min(L_max, max(1, int(self.scanDispatch)))
        size0 = bounds[batch + 1] - bounds[batch]
        L = 1
        while L < L_max and bounds[batch + L + 1] - bounds[batch + L] == size0:
            L += 1
        step0 = epoch * n_batches + batch
        until_val = (-step0) % self.validationInterval  # 0 = step0 validates
        return max(1, min(L, until_val + 1))

    def _run_scan(self, epoch, batch, bounds, L, perm):
        """Execute L consecutive equal-size steps as one scanned dispatch:
        ONE host gather + device transfer for the whole run, reshaped to a
        (L, B, ...) leading scan axis. Returns (per-step losses ndarray,
        per-step wall time)."""
        B = bounds[batch + 1] - bounds[batch]
        nb = self._step_nbytes.get(B)
        if nb is None:
            a0 = self._step_args(perm[bounds[batch]:bounds[batch + 1]])
            nb = self._step_nbytes[B] = sum(
                l.size * l.dtype.itemsize
                for l in jax.tree_util.tree_leaves(a0))
        L = max(1, min(L, int(self.scanMemoryBudget // max(1, nb))))
        keys = jnp.stack([self._next_key() for _ in range(L)])
        args = self._step_args(perm[bounds[batch]:bounds[batch + L]])
        xs, ys, auxs = self._shard_batch(
            jax.tree_util.tree_map(
                lambda l: l.reshape((L, B) + l.shape[1:]), args),
            batch_axis=1)
        t0 = _time.perf_counter()
        params, opt_state, losses = self._scan(
            self.model.params, self.model.opt_state, xs, ys, auxs, keys)
        losses = np.asarray(losses)  # ONE host sync for the whole run
        elapsed = (_time.perf_counter() - t0) / L
        self.model.params = params
        self.model.opt_state = opt_state
        if hasattr(self, "_step_count"):
            self._step_count += L
        return losses, elapsed

    def train_batch(self, idx):
        x, y, aux = self._shard_batch(self._step_args(idx), batch_axis=0)
        t0 = _time.perf_counter()
        params, opt_state, loss = self._step(
            self.model.params, self.model.opt_state, x, y, aux,
            self._next_key())
        loss = float(loss)
        elapsed = _time.perf_counter() - t0
        self.model.params = params
        self.model.opt_state = opt_state
        return loss, elapsed

    # -- the loop ----------------------------------------------------------
    def train(self):
        model, data = self.model, self.data
        n_train = data.nTrain
        bounds = _batch_bounds(n_train, self.batchSize)
        n_batches = len(bounds) - 1

        if (self.learningRateDecayRate is not None
                and self.learningRateDecayPeriod is not None
                and isinstance(model.optimizer_spec, dict)):
            base_lr = model.optimizer_spec.get(
                "lr", model.optimizer_spec.get("learningRate", 1e-3))
            rate = self.learningRateDecayRate
            period = self.learningRateDecayPeriod
            schedule = optax.exponential_decay(
                base_lr, transition_steps=period * n_batches,
                decay_rate=rate, staircase=True)
            model.rebuild_optimizer(schedule)
            self._build_step()

        self._replicate_state()
        loss_train, cost_valid, time_train = [], [], []
        best_score = None
        best_epoch = best_batch = 0
        lag = 0
        epoch = 0
        if self.resume:
            # pick up where 'Last' left off: epoch counter, RNG states,
            # best-score bookkeeping (SURVEY.md §5 resume contract)
            try:
                state = model.load("Last")
            except FileNotFoundError:
                state = None
            if state:
                epoch = state["next_epoch"]
                best_score = state["best_score"]
                best_epoch = state["best_epoch"]
                best_batch = state["best_batch"]
                lag = state["lag"]
                self.rng.bit_generator.state = state["np_rng"]
                self._key = jnp.asarray(state["key"])
                loss_train = list(state["loss_train"])
                cost_valid = list(state["cost_valid"])
        def _loop_state():
            return {
                "next_epoch": epoch, "best_score": best_score,
                "best_epoch": best_epoch, "best_batch": best_batch,
                "lag": lag, "np_rng": self.rng.bit_generator.state,
                "key": np.asarray(self._key),
                "loss_train": loss_train, "cost_valid": cost_valid,
            }

        def post_step(epoch, batch, loss, elapsed):
            """Per-step bookkeeping (identical for the per-step and scanned
            paths): record, print, log, validate/checkpoint/early-stop."""
            nonlocal best_score, best_epoch, best_batch, lag
            loss_train.append(loss)
            time_train.append(elapsed)
            step_no = epoch * n_batches + batch
            if self.doPrint and step_no % self.printInterval == 0:
                print(f"\t(E: {epoch + 1:2d}, B: {batch + 1:3d}) "
                      f"loss {loss:7.4f} - {elapsed:.4f}s")
            if self.logger is not None:
                self.logger.scalar_summary("Training", step_no,
                                           lossTrain=loss)
            if step_no % self.validationInterval == 0:
                cost = self._valid_cost(model.params)
                cost_valid.append(cost)
                if self.metricsFile:
                    append_jsonl(self.metricsFile, {
                        "step": step_no, "loss": loss, "valid_cost": cost})
                if self.logger is not None:
                    self.logger.scalar_summary("Validation", step_no,
                                               costValid=cost)
                if best_score is None or cost < best_score:
                    best_score = cost
                    best_epoch, best_batch = epoch, batch
                    model.save(label="Best")
                    lag = 0
                elif self.doEarlyStopping:
                    lag += 1

        while epoch < self.nEpochs and (lag < self.earlyStoppingLag
                                        or not self.doEarlyStopping):
            perm = self.rng.permutation(n_train)
            self._on_epoch_start(epoch)
            batch = 0
            while batch < n_batches and (lag < self.earlyStoppingLag
                                         or not self.doEarlyStopping):
                run = self._run_length(epoch, batch, bounds, n_batches)
                if run > 1:
                    losses, elapsed = self._run_scan(epoch, batch, bounds,
                                                     run, perm)
                    for j, loss in enumerate(losses):
                        post_step(epoch, batch + j, float(loss), elapsed)
                    batch += len(losses)
                else:
                    idx = perm[bounds[batch]:bounds[batch + 1]]
                    self._on_batch_start(epoch, batch, idx)
                    loss, elapsed = self.train_batch(idx)
                    post_step(epoch, batch, loss, elapsed)
                    batch += 1
            epoch += 1
            # per-epoch resumable checkpoint (params + opt + loop state)
            model.save(label="Last", extra=_loop_state())

        model.save(label="Last", extra=_loop_state())
        if best_score is not None:
            model.load(label="Best")  # reference reloads Best at end (:571)
        train_vars = {
            "nEpochs": self.nEpochs, "nBatches": n_batches,
            "batchSize": self.batchSize, "lossTrain": np.array(loss_train),
            "costValid": np.array(cost_valid),
            "timeTrain": np.array(time_train),
            "bestScore": best_score, "bestEpoch": best_epoch,
            "bestBatch": best_batch,
        }
        if self.doSaveVars:
            import os
            import pickle
            d = os.path.join(model.saveDir, "trainVars")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{model.name}.pkl"), "wb") as f:
                pickle.dump(train_vars, f)
        return train_vars

    # hooks for subclasses
    def _on_epoch_start(self, epoch):
        pass

    def _on_batch_start(self, epoch, batch, idx):
        pass


class TrainerSingleNode(Trainer):
    """Forward through singleNodeForward with target ids from
    data.getLabelID (reference training.py:580-714)."""

    def __init__(self, model, data, nEpochs, batchSize, **kwargs):
        super().__init__(model, data, nEpochs, batchSize, **kwargs)

    def _build_step(self):
        loss_fn = self.model.loss
        optimizer = self.model.optimizer
        arch = self.model.archit

        def step(params, opt_state, x, y, node_pos, key):
            def objective(p):
                pc, xc = self._mixed(p, x)
                ctx = arch._ctx_for_dtype(xc.dtype)
                y_all = arch.core.apply(pc, xc, ctx)[0]  # B x dim x N
                B = y_all.shape[0]
                yHat = y_all[jnp.arange(B), :, node_pos]
                return loss_fn(yHat.astype(jnp.float32), y)
            loss, grads = jax.value_and_grad(objective)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._finalize_step(step)

    def _node_positions(self, ids):
        order = list(self.model.archit.order)
        return jnp.asarray([order.index(int(n)) for n in ids])

    def _train_batch_data(self, idx):
        x, y = self.data.getSamples("train", idx)
        ids = self.data.getLabelID("train", idx)
        return x, y, self._node_positions(ids)

    def _forward(self, params, x, aux):
        arch = self.model.archit
        y_all = arch.core.apply(params, x, arch.ctx)[0]
        B = y_all.shape[0]
        return y_all[jnp.arange(B), :, aux]

    def _valid_data(self):
        x, y = self.data.getSamples("valid")
        ids = self.data.getLabelID("valid")
        return x, y, self._node_positions(ids)


class TrainerFlocking(Trainer):
    """Imitation learning of the expert flocking controller, with optional
    DAGger data aggregation; validation is the *closed-loop* trajectory
    cost (reference training.py:716-1696)."""

    def __init__(self, model, data, nEpochs, batchSize, **kwargs):
        self.probExpert = kwargs.get("probExpert")
        self.doDAGger = self.probExpert is not None
        self.DAGgerType = kwargs.get("DAGgerType", "randomEpoch")
        # ellDegree=D: feed the train step ops.ell.EllGso graphs (O(N·D))
        # instead of the dense (B,T,N,N) stack — large-swarm training.
        # When the DATASET already stores its commGraph as an EllGso
        # (Flocking.large), the whole trainer pipeline — storage,
        # batching, DAGger mutation, expert relabeling — stays in the
        # O(N·deg) layout and nothing dense(N²) is ever built.
        self.ellDegree = kwargs.get("ellDegree")
        # deviceStore=True: the DEVICE-RESIDENT trajectory store. The
        # training set lives on device as (n,T,2,N) pos/vel ONLY —
        # states, normalized comm graphs, and expert labels are
        # recomputed inside the jitted train step
        # (flocking._jnp_recompute_supervision), and DAGger re-rolls
        # run flocking.rollout_traj_device (nothing stacked or pulled:
        # randomEpoch's dense (B,T,N,N) graph pulls through the
        # ~25 MB/s tunnel were ~2 min/epoch at the reference config).
        # Supports no-DAGger, randomEpoch, and replaceTimeBatch;
        # fixedBatch concatenates fresh rollouts per batch and stays on
        # the host path. Training math matches the host store to f32
        # rounding (test_training.py parity) with ONE documented
        # divergence: expert labels are uniformly zeroed at t=T-1
        # (the reference generation convention — a T-1 accel never
        # drives a transition), whereas the host path's DAGger
        # RELABELED samples keep a nonzero T-1 label (an internal
        # inconsistency of the reference pipeline the device recompute
        # does not reproduce). Validation cost is computed on device
        # from the vel trajectory alone.
        self.deviceStore = bool(kwargs.get("deviceStore", False))
        if self.deviceStore:
            assert (self.probExpert is None
                    or kwargs.get("DAGgerType", "randomEpoch")
                    in ("randomEpoch", "replaceTimeBatch")), \
                "deviceStore supports no-DAGger, randomEpoch and " \
                "replaceTimeBatch (fixedBatch rolls out per batch on " \
                "host)"
            # dense recompute at reference scale, or the O(N) grid
            # recompute (ellDegree = the emitted graph width) when the
            # dataset rolls on the cell-list grid (Flocking.large_device)
            if getattr(data, "rollout_env_grid", None) is not None:
                assert self.ellDegree is not None, \
                    "grid deviceStore needs ellDegree (the recomputed " \
                    "ELL graph width D)"
            else:
                assert self.ellDegree is None, \
                    "deviceStore recomputes dense reference-scale " \
                    "graphs in the train step; ellDegree requires a " \
                    "grid dataset (Flocking.large_device)"
        super().__init__(model, data, nEpochs, batchSize, **kwargs)
        self.initPosAll = data.getData("initPos", "train")
        self.initVelAll = data.getData("initVel", "train")
        if self.deviceStore:
            import jax.numpy as jnp
            # the device rollouts need the compiled path: a finite
            # causal window or the step interface — fail at
            # construction, not at the first mid-training re-roll
            assert (hasattr(model.archit, "rollout_step")
                    or getattr(model.archit, "causal_window", None)
                    is not None), \
                "deviceStore needs a compiled-rollout-capable " \
                "architecture (rollout_step or a finite causal_window)"
            self.posAll = jnp.asarray(data.getData("pos", "train"),
                                      jnp.float32)
            self.velAll = jnp.asarray(data.getData("vel", "train"),
                                      jnp.float32)
            # jnp arrays are immutable: Orig handles are free snapshots
            self.posOrig, self.velOrig = self.posAll, self.velAll
            # re-roll chunk: fixed compiled shape; never above nTrain
            # (a 262k dataset of 4 trajectories must not pad a single
            # learner re-roll up to 16 rollouts)
            self.rolloutChunk = int(kwargs.get(
                "rolloutChunk", max(1, min(16, data.nTrain))))
            if (getattr(data, "rollout_env_grid", None) is not None
                    and kwargs.get("coverageCheck", True)):
                self._grid_coverage_check()
            return
        # training trajectories (kept in numpy; DAGger mutates them)
        self.xAll, self.yAll = data.getSamples("train")
        self.SAll = self._S_copy(data.getData("commGraph", "train"))
        self.xOrig = self.xAll.copy()
        self.yOrig = self.yAll.copy()
        self.SOrig = self._S_copy(self.SAll)

    # -- graph-trajectory storage ops (dense numpy OR numpy-leaf EllGso) ----
    @staticmethod
    def _is_ell(S):
        from graph_neural_networks_tpu.ops import ell as ell_lib
        return isinstance(S, ell_lib.EllGso)

    @staticmethod
    def _S_copy(S):
        from graph_neural_networks_tpu.ops import ell as ell_lib
        if isinstance(S, ell_lib.EllGso):
            return ell_lib.EllGso(np.copy(np.asarray(S.idx)),
                                  np.copy(np.asarray(S.val)))
        return S.copy()

    @staticmethod
    def _S_index(S, idx):
        from graph_neural_networks_tpu.ops import ell as ell_lib
        if isinstance(S, ell_lib.EllGso):
            return ell_lib.EllGso(np.asarray(S.idx)[idx],
                                  np.asarray(S.val)[idx])
        return S[idx]

    @staticmethod
    def _S_setitem(S, idx, value):
        from graph_neural_networks_tpu.ops import ell as ell_lib
        if isinstance(S, ell_lib.EllGso):
            S.idx[idx] = value.idx
            S.val[idx] = value.val
        else:
            S[idx] = value

    @staticmethod
    def _S_concat(a, b):
        from graph_neural_networks_tpu.ops import ell as ell_lib
        if isinstance(a, ell_lib.EllGso):
            return ell_lib.EllGso(np.concatenate([a.idx, b.idx], 0),
                                  np.concatenate([a.val, b.val], 0))
        return np.concatenate([a, b], 0)

    # forward takes (x, S)
    def _build_step(self):
        if getattr(self, "deviceStore", False):
            return self._build_step_device()
        loss_fn = self.model.loss
        optimizer = self.model.optimizer
        arch = self.model.archit

        needs_rng = _accepts_rng(arch.split_forward)

        def step(params, opt_state, x, y, S, key):
            def objective(p):
                pc, xc, Sc = self._mixed(p, x, S)
                if needs_rng:
                    yHat = arch.split_forward(pc, xc, Sc, rng=key)[0]
                else:
                    yHat = arch.split_forward(pc, xc, Sc)[0]
                return loss_fn(yHat.astype(jnp.float32), y)
            loss, grads = jax.value_and_grad(objective)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._finalize_step(step)

    def _grid_coverage_check(self):
        """One-time d_max-coverage + cell-overflow check of the
        ORIGINAL device store. Flocking.large_device generates
        eval-shaped (d_max=0 — nothing to truncate, so nothing could
        be checked), and the in-step supervision recompute runs
        inside jit where it cannot warn: if any agent's true in-degree
        exceeds ellDegree, training graphs would be silent top-D
        truncations of the untruncated dynamics. This checks every
        stored trajectory once at construction (learner re-rolls are
        covered separately by rollout_traj_device's own flag);
        coverageCheck=False skips it."""
        import jax
        import jax.numpy as jnp
        from graph_neural_networks_tpu.data import flocking as F
        data = self.data
        lam = getattr(data, "rollout_lam_iters", 1)

        @jax.jit
        def ok_of(pos, vel):
            return F._jnp_recompute_supervision_grid(
                pos, vel, data.commRadius, data.repelDist, 100.0,
                self.ellDegree, data.rollout_env_grid,
                lam_iters=lam)[3]

        ok = True
        for i in range(self.posAll.shape[0]):   # B=1: one compile
            ok = ok and bool(ok_of(self.posAll[i:i + 1],
                                   self.velAll[i:i + 1]))
        if not ok:
            import warnings
            warnings.warn(
                "grid deviceStore: a stored training trajectory "
                "overflows cell_cap or has in-degree > ellDegree — "
                "recomputed training graphs will be truncated "
                "inconsistently with the dynamics; raise ellDegree / "
                "cell_cap", RuntimeWarning)

    def _build_step_device(self):
        """Train step over the device-resident store: operands are the
        batch's (pos, vel) trajectories; states / graphs / expert
        labels are recomputed on device INSIDE the step (constant wrt
        params — outside the grad closure)."""
        import jax
        import jax.numpy as jnp
        loss_fn = self.model.loss
        optimizer = self.model.optimizer
        arch = self.model.archit
        data = self.data
        needs_rng = _accepts_rng(arch.split_forward)
        lam_method = ("power" if getattr(data, "rollout_lam_method",
                                         "eig") == "power" else "eig")
        from graph_neural_networks_tpu.data import flocking as F
        grid = getattr(data, "rollout_env_grid", None)

        def recompute(pos, vel):
            if grid is not None:
                from graph_neural_networks_tpu.ops import ell as ell_lib
                # expert clip 100.0 = generate_trajectories_large's
                # (the reference expert default), so relabeled learner
                # samples share the originals' label convention
                # ok is checked once over the store at construction
                # (_grid_coverage_check) and per re-roll by
                # rollout_traj_device — inside jit it cannot warn.
                # lam_iters follows the dataset's pipeline-wide value.
                x, y, (gi, gv), _ok = F._jnp_recompute_supervision_grid(
                    pos, vel, data.commRadius, data.repelDist, 100.0,
                    self.ellDegree, grid,
                    lam_iters=getattr(data, "rollout_lam_iters", 1))
                return x, y, ell_lib.EllGso(gi, gv)
            x, y, S = F._jnp_recompute_supervision(
                pos, vel, data.commRadius, data.repelDist,
                data.accelMax, lam_method)
            return x, y, S[:, :, None]

        def step(params, opt_state, pos, vel, aux, key):
            x, y, S5 = recompute(pos, vel)

            def objective(p):
                pc, xc, Sc = self._mixed(p, x, S5)
                if needs_rng:
                    yHat = arch.split_forward(pc, xc, Sc, rng=key)[0]
                else:
                    yHat = arch.split_forward(pc, xc, Sc)[0]
                return loss_fn(yHat.astype(jnp.float32), y)

            loss, grads = jax.value_and_grad(objective)(params)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._finalize_step(step)

    def _scan_eligible(self) -> bool:
        # fixedBatch rolls out the policy (host) inside every train_batch;
        # replaceTimeBatch mutates the training set before every batch —
        # both must stay step-by-step. randomEpoch only acts at epoch start.
        return (not self.doDAGger) or self.DAGgerType == "randomEpoch"

    def _device_S(self, S):
        from graph_neural_networks_tpu.ops import ell as ell_lib
        if self._is_ell(S):
            return ell_lib.EllGso(jnp.asarray(S.idx), jnp.asarray(S.val))
        S5 = S[:, :, None] if S.ndim == 4 else S
        if self.ellDegree is not None:
            return ell_lib.ell_from_dense(S5, d_max=self.ellDegree)
        return jnp.asarray(S5, jnp.float32)

    def _step_args(self, idx):
        if self.deviceStore:
            idxd = jnp.asarray(np.asarray(idx))
            return (jnp.take(self.posAll, idxd, axis=0),
                    jnp.take(self.velAll, idxd, axis=0), None)
        x = self.xAll[idx]
        y = self.yAll[idx]
        S = self._S_index(self.SAll, idx)
        return (jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                self._device_S(S))

    def train_batch(self, idx):
        if self.doDAGger and self.DAGgerType == "fixedBatch" \
                and not self.deviceStore \
                and self._step_count > 0:
            x = self.xAll[idx]
            y = self.yAll[idx]
            S = self._S_index(self.SAll, idx)
            xD, yD, SD = self._fixed_batch_dagger(self.initPosAll[idx],
                                                  self.initVelAll[idx])
            t0 = _time.perf_counter()
            x = jnp.asarray(np.concatenate([x, xD], 0), jnp.float32)
            y = jnp.asarray(np.concatenate([y, yD], 0), jnp.float32)
            S5 = self._device_S(self._S_concat(S, SD))
        else:
            t0 = _time.perf_counter()
            x, y, S5 = self._step_args(idx)
        x, y, S5 = self._shard_batch((x, y, S5), batch_axis=0)
        params, opt_state, loss = self._step(
            self.model.params, self.model.opt_state, x, y, S5,
            self._next_key())
        self.model.params = params
        self.model.opt_state = opt_state
        self._step_count += 1
        return float(loss), _time.perf_counter() - t0

    def train(self):
        self._step_count = 0
        return super().train()

    def _on_epoch_start(self, epoch):
        if self.doDAGger and epoch > 0 and self.DAGgerType == "randomEpoch":
            self._random_epoch_dagger(epoch)

    def _on_batch_start(self, epoch, batch, idx):
        if self.doDAGger and (epoch > 0 or batch > 0) \
                and self.DAGgerType == "replaceTimeBatch":
            self._replace_time_batch_dagger(epoch)

    # -- policy + expert helpers ------------------------------------------
    def _policy(self):
        """Traceable policy (params, x_hist, S_hist) -> accel: runs inside
        the jitted lax.scan rollout (flocking._scan_rollout) when the
        architecture has a finite causal window; also serves the host-loop
        fallback. Built once so the rollout compile cache hits."""
        if getattr(self, "_policy_fn", None) is None:
            arch = self.model.archit

            def fn(params, x_hist, S_hist):
                from graph_neural_networks_tpu.ops import ell as ell_lib
                if not isinstance(S_hist, ell_lib.EllGso):
                    S_hist = jnp.asarray(S_hist, jnp.float32)
                return arch.apply(params,
                                  jnp.asarray(x_hist, jnp.float32),
                                  S_hist)
            self._policy_fn = fn
        return self._policy_fn

    def _expert_accel(self, pos, vel):
        """Optimal acceleration along a visited trajectory
        (reference training.py:1320-1400). With a chunked env configured
        (Flocking.large / rollout_env_chunk) the jitted O(N·deg) expert
        runs instead of the O(T·N²) numpy pairwise build; with a grid
        env configured (rollout_env_grid) the O(N) cell-list expert
        runs (collision sums from one window pass at the repel
        radius)."""
        data = self.data
        grid = getattr(data, "rollout_env_grid", None)
        if grid is not None:
            from graph_neural_networks_tpu.data.flocking import (
                _jnp_expert_accel_grid, _parse_env_grid)
            gts, gcc, gcf = _parse_env_grid(grid)
            B, T, _, N = pos.shape
            a, ok = _jnp_expert_accel_grid(
                jnp.asarray(pos.reshape(B * T, 2, N), jnp.float32),
                jnp.asarray(vel.reshape(B * T, 2, N), jnp.float32),
                data.commRadius, data.repelDist, data.accelMax,
                table_size=gts, cell_cap=gcc, factor=gcf)
            if not bool(ok):
                import warnings
                warnings.warn(
                    "grid cell_cap overflowed during DAGger expert "
                    "relabeling — raise cell_cap/table_size",
                    RuntimeWarning)
            return np.asarray(a, np.float64).reshape(B, T, 2, N)
        chunk = getattr(data, "rollout_env_chunk", None)
        if chunk:
            from graph_neural_networks_tpu.data.flocking import (
                _fit_chunk, _jnp_expert_accel_chunked)
            B, T, _, N = pos.shape
            a = _jnp_expert_accel_chunked(
                jnp.asarray(pos.reshape(B * T, 2, N), jnp.float32),
                jnp.asarray(vel.reshape(B * T, 2, N), jnp.float32),
                data.repelDist, data.accelMax, _fit_chunk(N, chunk))
            return np.asarray(a, np.float64).reshape(B, T, 2, N)
        from graph_neural_networks_tpu.data.flocking import compute_differences
        from graph_neural_networks_tpu.data.base import invert_tensor_ew
        diff_pos, dist_sq = compute_differences(pos)
        diff_vel, _ = compute_differences(vel)
        repel = (dist_sq < data.repelDist ** 2).astype(np.float64)
        diff_pos = diff_pos * repel[..., None, :, :]
        inv = invert_tensor_ew(dist_sq)[..., None, :, :]
        accel = (-np.sum(diff_vel, axis=-1)
                 + 2 * np.sum(diff_pos * (inv ** 2 + inv), axis=-1))
        return np.clip(accel, -data.accelMax, data.accelMax)

    def _rollout_policy(self, init_pos, init_vel, chunk: int = 16):
        """Closed-loop rollouts in fixed-size chunks (last chunk padded by
        repetition) so the jitted forward never sees a new batch size —
        varying DAGger sample counts would otherwise recompile every
        epoch."""
        data = self.data
        n = init_pos.shape[0]
        window = getattr(self.model.archit, "causal_window", None)
        policy = self._policy()
        outs = []
        for lo in range(0, n, chunk):
            ip = init_pos[lo:lo + chunk]
            iv = init_vel[lo:lo + chunk]
            keep = ip.shape[0]
            pad = chunk - keep
            if pad:  # always pad to the chunk size: one compiled shape
                ip = np.concatenate([ip, ip[:1].repeat(pad, 0)], 0)
                iv = np.concatenate([iv, iv[:1].repeat(pad, 0)], 0)
            pos, vel, _, states, graphs = data.compute_trajectory(
                ip, iv, data.duration, archit=policy,
                params=self.model.params, history_window=window)
            from graph_neural_networks_tpu.ops import ell as ell_lib
            if isinstance(graphs, ell_lib.EllGso):
                if self._is_ell(self.SAll):
                    # O(N·deg) storage end-to-end (Flocking.large)
                    graphs = ell_lib.EllGso(
                        np.asarray(graphs.idx)[:keep],
                        np.asarray(graphs.val)[:keep])
                else:
                    # DAGger trajectory storage is dense numpy (B,T,N,N)
                    graphs = ell_lib.ell_to_dense(graphs)[:keep, :, 0]
            else:
                graphs = graphs[:keep]
            y = self._expert_accel(pos, vel)
            outs.append((states[:keep], y[:keep], graphs))
        states = np.concatenate([o[0] for o in outs], 0)
        y = np.concatenate([o[1] for o in outs], 0)
        graphs = outs[0][2]
        for o in outs[1:]:
            graphs = self._S_concat(graphs, o[2])
        return states, y, graphs

    # -- DAGger variants ---------------------------------------------------
    def _fixed_batch_dagger(self, init_pos, init_vel):
        return self._rollout_policy(init_pos, init_vel)

    def _device_store_update(self, sel):
        """Re-roll the policy from initial conditions `sel` (host int
        array) and write the (pos, vel) trajectories into the device
        store. Rollouts run in fixed-size chunks (one compiled shape);
        pad rollouts target the out-of-bounds sentinel index and are
        dropped by the scatter, so every epoch reuses the same compiled
        update regardless of how many samples DAGger re-rolls."""
        data = self.data
        n = self.posAll.shape[0]
        chunk = self.rolloutChunk
        window = getattr(self.model.archit, "causal_window", None)
        for lo in range(0, len(sel), chunk):
            sub = np.asarray(sel[lo:lo + chunk])
            keep = len(sub)
            pad = chunk - keep
            ip = self.initPosAll[sub]
            iv = self.initVelAll[sub]
            if pad:
                ip = np.concatenate([ip, ip[:1].repeat(pad, 0)], 0)
                iv = np.concatenate([iv, iv[:1].repeat(pad, 0)], 0)
            pos, vel = data.rollout_traj_device(
                ip, iv, data.duration, self._policy_archit(),
                self.model.params, history_window=window)
            tgt = jnp.asarray(np.concatenate(
                [sub, np.full(pad, n)]).astype(np.int32))
            self.posAll = self.posAll.at[tgt].set(pos, mode="drop")
            self.velAll = self.velAll.at[tgt].set(vel, mode="drop")

    def _policy_archit(self):
        """The architecture itself (step/window interfaces) for device
        rollouts; _policy() wraps it for the host/compiled paths."""
        return self.model.archit

    def _random_epoch_dagger(self, epoch):
        p = max(self.probExpert ** epoch, 0.5)
        n = self.initPosAll.shape[0]
        use_expert = self.rng.binomial(1, p, n).astype(bool)
        learner_idx = np.flatnonzero(~use_expert)
        if self.deviceStore:
            self.posAll, self.velAll = self.posOrig, self.velOrig
            if len(learner_idx):
                self._device_store_update(learner_idx)
            return
        self.xAll = self.xOrig.copy()
        self.yAll = self.yOrig.copy()
        self.SAll = self._S_copy(self.SOrig)
        if len(learner_idx):
            xs, ys, Ss = self._rollout_policy(self.initPosAll[learner_idx],
                                              self.initVelAll[learner_idx])
            self.xAll[learner_idx] = xs
            self.yAll[learner_idx] = ys
            self._S_setitem(self.SAll, learner_idx, Ss)

    def _replace_time_batch_dagger(self, epoch, nReplace: int = 10):
        n = self.initPosAll.shape[0]
        nReplace = min(nReplace, n)
        sel = self.rng.permutation(n)[:nReplace]
        if self.deviceStore:
            self._device_store_update(sel)
            return
        xs, ys, Ss = self._rollout_policy(self.initPosAll[sel],
                                          self.initVelAll[sel])
        self.xAll[sel] = xs
        self.yAll[sel] = ys
        self._S_setitem(self.SAll, sel, Ss)

    # -- validation: closed-loop cost --------------------------------------
    def _valid_cost(self, params):
        data = self.data
        init_pos = data.getData("initPos", "valid")
        init_vel = data.getData("initVel", "valid")
        window = getattr(self.model.archit, "causal_window", None)
        if self.deviceStore:
            # device rollout + on-device velocity-variance cost: the
            # only d2h is the final scalar (same formula as evaluate)
            _, vel = data.rollout_traj_device(
                init_pos, init_vel, data.duration,
                self._policy_archit(), params, history_window=window)
            from graph_neural_networks_tpu.data.flocking import (
                evaluate_cost_device)
            return float(evaluate_cost_device(vel))
        _, vel, _, _, _ = data.compute_trajectory(
            init_pos, init_vel, data.duration, archit=self._policy(),
            params=params,
            history_window=window,
            return_graphs="auto")   # validation cost never reads them
        return float(data.evaluate(vel=vel))
