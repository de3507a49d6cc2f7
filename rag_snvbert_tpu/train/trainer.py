"""Training orchestration: epochs, curriculum, validation, early stopping,
metrics CSV, checkpointing.

Reference parity (behavioral):
  - epoch loop with per-epoch mask regeneration (seed = epoch) and
    retrieval-context invalidation (src/train_embedding_rag.py:343-434);
  - curriculum add_level every 2 epochs, capped (=level 5 -> 80%)
    (:415-431; data/masking.MASK_RATES);
  - validation at a fixed level/seed (:274-291 — level 4, seed 2024);
  - early stopping on val F1 with patience + min_delta
    (pretrain_with_val_optimized.py:490-522);
  - per-epoch metrics CSV (append mode, :424-481) + jsonl event log;
  - checkpoints every epoch + best (:524-552) via orbax: params, opt state,
    step, epoch, curriculum level.  The retrieval index is derived state
    and is NOT checkpointed (train_embedding_rag.py:378-387).
"""

from __future__ import annotations

import csv
import dataclasses
import json
import os
import time
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..data import masking
from ..data.pipeline import WindowDataset
from . import metrics as metrics_lib
from .retrieval import build_token_window_ctx, encode_window_refs
from .schedule import make_optimizer
from .step import (StepConfig, TrainState, eval_step, train_step,
                   train_step_scan)


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 20
    batch_size: int = 24
    val_batch_size: int = 48
    init_lr: float = 1e-5
    max_lr: float = 7.5e-5
    warmup_steps: int = 15000
    grad_accum_steps: int = 1
    focal_gamma: float = 2.0
    use_recon_loss: bool = False
    rag_k: int = 1
    rare_threshold: float = 0.05
    curriculum_every: int = 2          # add_level every N epochs
    max_level: int = masking.MAX_LEVEL
    val_level: int = masking.VAL_LEVEL
    val_seed: int = masking.VAL_SEED
    patience: int = 5
    min_delta: float = 0.001
    val_metric: str = "hap_f1"
    ref_pad_haps: int = 2048           # static panel-size pad per window
    rag_mode: str = "embedding"        # "embedding" (V18) | "token" (V17) | "none"
    output_dir: str = "runs/default"
    log_freq: int = 100
    seed: int = 42
    # Dropout key implementation: 'rbg' generates random bits ~5x faster
    # than threefry on TPU (measured: 327 -> 212 ms/step on the flagship) at
    # slightly weaker statistical guarantees — fine for dropout masks.
    rng_impl: str = "rbg"
    # Dispatch the next window's retrieval-context encode while the current
    # window is still training (async overlap hides the refresh).  Costs a
    # second resident context — 1.6 GB at flagship scale, where the hidden
    # refresh is only ~0.3% of a window's step time and the extra context
    # can tip 16 GB HBM over the edge — so the default is off; enable for
    # small panels or short windows where the refresh fraction is large.
    # Staleness when on: params up to one window older, the same class as
    # the reference's entry-time cache (embedding_rag_dataset.py:334-377).
    prefetch_ctx: bool = False
    # Shard the per-window retrieval context over the mesh's ``index`` axis
    # (train/sharded_retrieval.py): each device encodes + searches only its
    # own reference rows, with an exact ICI candidate merge.  Required when
    # ref_pad_haps x L x D exceeds one chip's HBM; needs ``mesh``.  "auto"
    # enables it whenever the mesh has an index axis of size > 1.
    shard_ctx: bool | str = "auto"
    # Candidate-merge collective for sharded retrieval:
    # "all_gather" (one collective) | "ring" (ppermute, lower peak memory).
    ctx_merge: str = "all_gather"
    # Host-side batch prefetch depth (data/prefetch.py): numpy batch
    # assembly runs on a daemon thread this many batches ahead of the
    # device stream, overlapping make_batch with the previous step's
    # compute.  0 disables (synchronous assembly).
    prefetch_batches: int = 2
    # Training mask schedule: "level" = the discrete curriculum (add_level
    # every ``curriculum_every`` epochs); "cosine" | "linear" |
    # "exponential" = the continuous AdaptiveMaskScheduler ramp
    # (masking.adaptive_mask_ratio; reference src/main/pretrain.py:21-36).
    # Validation always uses the fixed val_level/val_seed.
    mask_schedule: str = "level"
    mask_start: float = 0.15           # continuous-schedule ramp bounds
    mask_end: float = 0.8
    # Record a host timestamp after every dispatched step into
    # ``Trainer.step_marks`` (cleared per epoch).  Dispatch is async, but
    # donated state buffers throttle the loop to the device rate once the
    # pipeline fills, so mark deltas give the realizable per-step
    # distribution — used by tools/bench_epoch_window for the full-epoch
    # evidence run.
    record_step_times: bool = False
    # Train steps fused per device dispatch: consecutive same-window
    # batches are stacked [K, ...] and lax.scan runs K optimizer steps in
    # one jitted call (train/step.train_step_scan) — semantics identical,
    # but per-dispatch link latency is amortized K-fold.  Matters on a
    # remote-attached chip (~10-20 ms/dispatch); neutral on co-located
    # hosts.  1 disables; validation always runs per-step.
    steps_per_dispatch: int = 1
    # Checkpointing: save asynchronously (orbax async — the save overlaps
    # the next epoch's steps instead of blocking the stream) and keep only
    # the newest N epoch checkpoints on disk (best is always kept).
    # keep_checkpoints=0 keeps everything.
    async_checkpoints: bool = True
    keep_checkpoints: int = 3
    # XLA profiler capture (the tracing endpoint SURVEY section 5 promised
    # in place of the reference's wall-clock `timer` decorator): write a
    # TensorBoard-loadable jax.profiler trace of ``profile_steps`` steady
    # steps (the compile step is skipped) from the first trained epoch
    # into ``profile_dir``.
    profile_dir: str | None = None
    profile_steps: int = 4


@dataclasses.dataclass
class EarlyStopping:
    """Best-metric tracker with patience (pretrain_with_val_optimized.py:
    490-522)."""

    patience: int
    min_delta: float
    best: float = -np.inf
    best_epoch: int = -1
    bad_epochs: int = 0

    def update(self, value: float, epoch: int) -> tuple[bool, bool]:
        """Returns (is_best, should_stop)."""
        if value > self.best + self.min_delta:
            self.best, self.best_epoch, self.bad_epochs = value, epoch, 0
            return True, False
        self.bad_epochs += 1
        return False, self.bad_epochs >= self.patience


def _chunk_batches(it, k: int):
    """Group consecutive same-window (meta, batch) pairs into stacked
    [K, ...] chunks for train_step_scan.  Chunks never span a window
    boundary (each scan shares one retrieval context); the trailing
    chunk of a window may be shorter (one extra compiled shape)."""
    pending: list = []
    cur_meta = None

    def flush():
        stacked = {key: np.stack([b[key] for b in pending])
                   for key in pending[0]}
        return cur_meta, stacked

    for meta, b in it:
        if pending and (meta.window_idx != cur_meta.window_idx
                        or len(pending) == k):
            yield flush()
            pending = []
        cur_meta = meta
        pending.append(b)
    if pending:
        yield flush()


def _with_lookahead(it):
    """Yield (item..., next_meta) with one-step lookahead over
    (meta, batch) pairs; next_meta is None on the last batch."""
    prev = None
    for meta, batch in it:
        if prev is not None:
            yield prev[0], prev[1], meta
        prev = (meta, batch)
    if prev is not None:
        yield prev[0], prev[1], None


class Trainer:
    """Window-major RAG trainer."""

    def __init__(self, model, embed_fn: Callable, train_ds: WindowDataset,
                 cfg: TrainerConfig, val_ds: WindowDataset | None = None,
                 init_params: Any | None = None, mesh=None,
                 train_sample_ids=None, val_sample_ids=None):
        """``mesh``: optional jax.sharding.Mesh for data-parallel training —
        params/opt-state replicated, batches sharded over the ``data`` axis
        (gradient psum over ICI inserted by the compiler).  Batch size must
        be a multiple of the data-axis size.

        ``train_sample_ids``/``val_sample_ids``: optional sample-index
        subsets (e.g. the stratified split written by prepare-data) — the
        single-cohort train/val workflow of the reference
        (scripts/split_data.py:14-261): when ``val_sample_ids`` is given
        without a separate ``val_ds``, validation runs on ``train_ds``
        restricted to those samples."""
        self.model = model
        self.embed_fn = embed_fn
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.train_sample_ids = (None if train_sample_ids is None
                                 else np.asarray(train_sample_ids))
        self.val_sample_ids = (None if val_sample_ids is None
                               else np.asarray(val_sample_ids))
        self.cfg = cfg
        self.mesh = mesh
        self.level = 0
        self.step_marks: list | None = None  # see record_step_times
        self.start_epoch = 0
        self.stopper = EarlyStopping(cfg.patience, cfg.min_delta)
        self.step_cfg = StepConfig(
            focal_gamma=cfg.focal_gamma, use_recon=cfg.use_recon_loss,
            rag_k=cfg.rag_k, rare_threshold=cfg.rare_threshold,
            ctx_merge=cfg.ctx_merge)
        os.makedirs(cfg.output_dir, exist_ok=True)
        self.csv_path = os.path.join(cfg.output_dir, "metrics.csv")
        self.log_path = os.path.join(cfg.output_dir, "events.jsonl")

        if init_params is None:
            from ..models import init_batch
            dims = model.bert.dims
            ib = init_batch(1, train_ds.seq_len, dims,
                            with_rag_emb=(cfg.rag_mode == "embedding"),
                            with_rag_seg=(cfg.rag_mode == "token"))
            init_params = jax.jit(lambda k: model.init(k, ib))(
                jax.random.key(cfg.seed))["params"]
        tx = make_optimizer(cfg.init_lr, cfg.max_lr, cfg.warmup_steps,
                            accum_steps=cfg.grad_accum_steps)
        self.state = TrainState.create(apply_fn=model.apply,
                                       params=init_params, tx=tx)
        self.rng = jax.random.key(cfg.seed, impl=cfg.rng_impl)
        # Resolve the search-kernel path from where the params actually live
        # (the axon TPU registers as default backend even when work is
        # pinned to CPU, so jax.default_backend() alone is unreliable).
        self.shard_ctx = (cfg.shard_ctx if isinstance(cfg.shard_ctx, bool)
                          else (mesh is not None
                                and mesh.shape.get("index", 1) > 1))
        if self.shard_ctx:
            assert self.mesh is not None and "index" in self.mesh.shape, (
                "shard_ctx requires a mesh with an 'index' axis")
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert cfg.batch_size % self.mesh.shape["data"] == 0, (
                "batch_size must divide evenly over the data axis")
            self._repl = NamedSharding(self.mesh, P())
            self._data_sh = NamedSharding(self.mesh, P("data"))
            # Stacked [K, B, ...] scan chunks: the leading axis is scan
            # steps, NOT batch — shard axis 1 over data, replicate axis 0.
            self._scan_sh = NamedSharding(self.mesh, P(None, "data"))
            self._put_state()
        leaf = jax.tree.leaves(self.state.params)[0]
        platform = getattr(getattr(leaf, "device", None), "platform", None)
        if platform is None and self.mesh is not None:
            platform = next(iter(self.mesh.devices.flat)).platform
        # On CPU force the XLA path; on TPU leave None so retrieval
        # auto-selects by workload size.
        self.step_cfg = dataclasses.replace(
            self.step_cfg, use_pallas=None if platform == "tpu" else False)

    # Packed-batch leaves that carry no batch dimension (window-level):
    # replicated on a mesh instead of data-sharded.
    _WINDOW_LEVEL_KEYS = frozenset({"pos", "af", "feat_rows"})

    def _put_batch(self, batch: dict, stacked: bool) -> dict:
        """Transfer a host batch to device(s) with per-key shardings.

        Single device: plain jnp.asarray.  Mesh: batch-dim leaves shard
        over the ``data`` axis (axis 1 when ``stacked`` — axis 0 is scan
        steps); window-level packed leaves replicate.  Idempotent on
        already-transferred leaves (the prefetch thread uses it too).
        """
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        out = {}
        for k, v in batch.items():
            if k in self._WINDOW_LEVEL_KEYS:
                sh = self._repl
            elif stacked:
                sh = self._scan_sh
            else:
                sh = self._data_sh
            out[k] = jax.device_put(v, sh)
        return out

    # ---- retrieval context management (the JIT index cache, functional) ----

    def _window_ctx(self, ds: WindowDataset, meta, level: int, seed: int):
        toks, af, valid = ds.window_ref_tokens(
            meta, pad_haps_to=self.cfg.ref_pad_haps)
        wmask = ds.window_mask(meta, level, seed)
        if self.cfg.rag_mode == "token":
            return build_token_window_ctx(jnp.asarray(toks),
                                          jnp.asarray(wmask),
                                          valid=jnp.asarray(valid))
        if self.shard_ctx:
            from .sharded_retrieval import encode_window_refs_sharded

            return encode_window_refs_sharded(
                self.embed_fn, self.state.params, jnp.asarray(toks),
                jnp.asarray(af), jnp.asarray(wmask), self.mesh,
                valid=jnp.asarray(valid))
        return encode_window_refs(
            self.embed_fn, self.state.params, jnp.asarray(toks),
            jnp.asarray(af), jnp.asarray(wmask), valid=jnp.asarray(valid))

    # ---- epoch loops ----

    @property
    def has_validation(self) -> bool:
        return self.val_ds is not None or self.val_sample_ids is not None

    def _run_epoch(self, epoch: int, train: bool) -> dict:
        ds = self.train_ds if train else (self.val_ds or self.train_ds)
        sample_ids = self.train_sample_ids if train else self.val_sample_ids
        level = self.level if train else self.cfg.val_level
        if train and self.cfg.mask_schedule != "level":
            # Continuous AdaptiveMaskScheduler ratio instead of the
            # discrete curriculum level (floats flow through
            # masking.mask_rate directly).
            level = masking.adaptive_mask_ratio(
                epoch, self.cfg.epochs, start=self.cfg.mask_start,
                end=self.cfg.mask_end, schedule=self.cfg.mask_schedule)
        seed = epoch if train else self.cfg.val_seed
        bs = self.cfg.batch_size if train else self.cfg.val_batch_size
        # Counters/totals stay ON DEVICE across the epoch (tiny adds in
        # the async stream); each np fetch costs a host round trip — at 42
        # steps/window x ~16 counter leaves that was ~0.5 s/step on a
        # remote-attached chip.
        acc = {"counters": metrics_lib.zeros_like_counters(),
               "totals": {"loss": jnp.zeros(()), "hap_loss": jnp.zeros(()),
                          "gt_loss": jnp.zeros(())}}
        # distinct buffers per leaf: the accumulator is DONATED into the
        # step, and zeros_like_counters shares arrays between fields
        # (donating one buffer twice is an error)
        acc = jax.tree.map(lambda x: x.copy(), acc)
        n_batches = 0
        t0 = time.time()
        self.step_marks = [] if self.cfg.record_step_times else None
        want_prof = bool(train and self.cfg.profile_dir
                         and epoch == self.start_epoch)
        prof_start_n = None
        current_wid = -1
        ctx = None
        prefetched: dict[int, object] = {}
        use_rag = ds.ref_vcf is not None and self.cfg.rag_mode != "none"
        # Ship the compact wire format (int8 tokens, [L] window features,
        # [P, L, 4] feature rows) and expand on device — ~5x fewer bytes
        # over the host->device link per step.  On a mesh the per-key
        # shardings in _put_batch replicate the window-level leaves and
        # shard the batch-dim leaves over ``data``.
        batch_iter = ds.epoch_batches(bs, epoch, level, shuffle=train,
                                      seed=seed, sample_ids=sample_ids,
                                      packed=True)
        k_scan = self.cfg.steps_per_dispatch if train else 1
        if k_scan > 1:
            batch_iter = _chunk_batches(batch_iter, k_scan)
        if self.cfg.prefetch_batches > 0:
            from ..data.prefetch import prefetch_iter

            # Issue the host->device copy from the producer thread too,
            # so it overlaps the previous step's compute instead of
            # sitting between steps.  The loop-body conversion below
            # then no-ops on the transferred arrays.
            batch_iter = prefetch_iter(
                batch_iter, size=self.cfg.prefetch_batches,
                transform=lambda mb: (mb[0],
                                      self._put_batch(mb[1],
                                                      stacked=k_scan > 1)))
        for meta, np_batch, next_meta in _with_lookahead(batch_iter):
            if use_rag and meta.window_idx != current_wid:
                # Window switch -> rebuild the derived retrieval context
                # (prefetched if the previous window already dispatched it).
                ctx = prefetched.pop(meta.window_idx, None)
                if ctx is None:
                    ctx = self._window_ctx(ds, meta, level, seed)
                if self.mesh is not None and not self.shard_ctx:
                    ctx = jax.device_put(ctx, self._repl)
                current_wid = meta.window_idx
            if (use_rag and self.cfg.prefetch_ctx and next_meta is not None
                    and next_meta.window_idx != current_wid
                    and next_meta.window_idx not in prefetched):
                # In-loop refresh overlap: dispatch the NEXT window's
                # encode now — JAX's async dispatch runs it behind the
                # remaining steps of the current window, hiding the
                # refresh latency entirely (SURVEY.md section 7, step 6).
                prefetched.clear()
                prefetched[next_meta.window_idx] = self._window_ctx(
                    ds, next_meta, level, seed)
            batch = self._put_batch(np_batch, stacked=k_scan > 1)
            step_mesh = self.mesh if self.shard_ctx else None
            if k_scan > 1:
                self.state, stats, acc = train_step_scan(
                    self.state, batch, ctx, self.rng, self.embed_fn,
                    self.step_cfg, mesh=step_mesh, acc=acc)
                n_batches += next(iter(batch.values())).shape[0]
            elif train:
                self.state, stats, acc = train_step(
                    self.state, batch, ctx, self.rng, self.embed_fn,
                    self.step_cfg, mesh=step_mesh, acc=acc)
                n_batches += 1
            else:
                stats, acc = eval_step(self.state, batch, ctx,
                                       self.embed_fn, self.step_cfg,
                                       mesh=step_mesh, acc=acc)
                n_batches += 1
            if self.step_marks is not None:
                self.step_marks.append(time.time())
            if want_prof:
                if prof_start_n is None and n_batches >= 1:
                    # skip the compile step; block so the trace starts clean
                    jax.block_until_ready(stats["loss"])
                    jax.profiler.start_trace(self.cfg.profile_dir)
                    prof_start_n = n_batches
                elif (prof_start_n is not None
                      and n_batches - prof_start_n
                      >= self.cfg.profile_steps):
                    float(stats["loss"])      # hard sync: steps are on-trace
                    jax.profiler.stop_trace()
                    want_prof = False
            if train and n_batches % self.cfg.log_freq == 0:
                self._log({"event": "step", "epoch": epoch,
                           "batch": n_batches,
                           "loss": float(stats["loss"])})
        if want_prof and prof_start_n is not None:  # short epoch: close out
            jax.profiler.stop_trace()
        acc = jax.device_get(acc)             # one sync per epoch
        counters, totals = acc["counters"], acc["totals"]
        summary = metrics_lib.summarize(counters)
        summary.update({k: float(v) / max(n_batches, 1)
                        for k, v in totals.items()})
        summary["epoch_seconds"] = time.time() - t0
        summary["n_batches"] = n_batches
        return summary

    def fit(self) -> dict:
        cfg = self.cfg
        history = []
        self.level = min(self.start_epoch // cfg.curriculum_every,
                         cfg.max_level)
        for epoch in range(self.start_epoch, cfg.epochs):
            tr = self._run_epoch(epoch, train=True)
            self._log({"event": "train_epoch", "epoch": epoch,
                       "level": self.level, **tr})
            row = {"epoch": epoch, "level": self.level,
                   **{f"train_{k}": v for k, v in tr.items()}}
            if self.has_validation:
                va = self._run_epoch(epoch, train=False)
                self._log({"event": "val_epoch", "epoch": epoch, **va})
                row.update({f"val_{k}": v for k, v in va.items()})
                metric = va.get(cfg.val_metric.replace("f1", "hap_f1")
                                if cfg.val_metric == "f1" else cfg.val_metric,
                                va["hap_f1"])
                is_best, should_stop = self.stopper.update(metric, epoch)
                self.save_checkpoint(epoch, is_best=is_best)
                if should_stop:
                    self._log({"event": "early_stop", "epoch": epoch,
                               "best_epoch": self.stopper.best_epoch,
                               "best": self.stopper.best})
                    self._write_csv_row(row)
                    history.append(row)
                    break
            else:
                self.save_checkpoint(epoch, is_best=False)
            self._write_csv_row(row)
            history.append(row)
            # curriculum: add_level every N epochs, capped
            if (epoch + 1) % cfg.curriculum_every == 0:
                self.level = min(self.level + 1, cfg.max_level)
        self.finalize()  # commit any in-flight async checkpoint
        return {"history": history, "best": self.stopper.best,
                "best_epoch": self.stopper.best_epoch}

    # ---- persistence ----

    _ckptr = None

    def _checkpointer(self):
        if self._ckptr is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def save_checkpoint(self, epoch: int, is_best: bool) -> None:
        """Save the epoch checkpoint.  With ``async_checkpoints`` the save
        runs on orbax's background thread and overlaps the next epoch's
        steps (a new save waits for the previous commit, so at most one is
        in flight); old epoch dirs beyond ``keep_checkpoints`` are garbage
        collected (the best checkpoint is always kept)."""
        ckptr = self._checkpointer()
        path = os.path.abspath(
            os.path.join(self.cfg.output_dir, f"ckpt_ep{epoch}"))
        payload = {"params": self.state.params,
                   "opt_state": self.state.opt_state,
                   "step": np.asarray(self.state.step),
                   "epoch": np.asarray(epoch),
                   "level": np.asarray(self.level),
                   # Early-stop tracker: without it a resumed run resets
                   # patience and trivially re-crowns "best" (observed in
                   # the round-4 artifact's resume leg).
                   "es_best": np.asarray(self.stopper.best),
                   "es_best_epoch": np.asarray(self.stopper.best_epoch),
                   "es_bad_epochs": np.asarray(self.stopper.bad_epochs)}
        ckptr.save(path, payload, force=True)
        if not self.cfg.async_checkpoints:
            ckptr.wait_until_finished()
        if is_best:
            best = os.path.join(self.cfg.output_dir, "best")
            if os.path.islink(best):
                os.unlink(best)
            os.symlink(path, best)
        self._gc_checkpoints(current_epoch=epoch)

    def _gc_checkpoints(self, current_epoch: int) -> None:
        """Keep the newest ``keep_checkpoints`` epoch dirs + the best.
        Only epochs < current are deleted — their saves are durably
        committed (orbax serializes async saves)."""
        keep = self.cfg.keep_checkpoints
        if keep <= 0:
            return
        best = os.path.join(self.cfg.output_dir, "best")
        best_target = os.path.realpath(best) if os.path.islink(best) else None
        epochs = []
        for name in os.listdir(self.cfg.output_dir):
            if name.startswith("ckpt_ep"):
                try:
                    epochs.append(int(name[len("ckpt_ep"):]))
                except ValueError:
                    continue
        for ep in sorted(epochs)[:-keep] if len(epochs) > keep else []:
            path = os.path.abspath(
                os.path.join(self.cfg.output_dir, f"ckpt_ep{ep}"))
            if ep >= current_epoch or path == best_target:
                continue
            import shutil

            shutil.rmtree(path, ignore_errors=True)

    def finalize(self) -> None:
        """Block until any in-flight async checkpoint save commits."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()

    def _put_state(self) -> None:
        """Place the TrainState on the mesh: replicated by default;
        with a model axis > 1, Megatron-style TP shardings on the
        params and their adam-moment mirrors (parallel/tp.py — GSPMD
        inserts the per-block all-reduces).  Re-run after any state
        swap (checkpoint restore, warm start)."""
        if self.mesh is None:
            return
        if self.mesh.shape.get("model", 1) > 1:
            from ..parallel.tp import shard_tree

            self.state = shard_tree(self.state, self.mesh)
        else:
            self.state = jax.device_put(self.state, self._repl)

    def restore_checkpoint(self, path: str) -> None:
        """Resume weights + optimizer + curriculum
        (train_embedding_rag.py:154-192, 325-336)."""
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            target = {"params": self.state.params,
                      "opt_state": self.state.opt_state,
                      "step": np.asarray(self.state.step),
                      "epoch": np.asarray(0),
                      "level": np.asarray(0)}
            # Stopper state was added after round 4; restore it when the
            # checkpoint has it, tolerate checkpoints that predate it.
            es_target = {**target, "es_best": np.asarray(0.0),
                         "es_best_epoch": np.asarray(0),
                         "es_bad_epochs": np.asarray(0)}
            try:
                restored = ckptr.restore(os.path.abspath(path), es_target)
                self.stopper.best = float(restored["es_best"])
                self.stopper.best_epoch = int(restored["es_best_epoch"])
                self.stopper.bad_epochs = int(restored["es_bad_epochs"])
            except Exception:
                restored = ckptr.restore(os.path.abspath(path), target)
        self.state = self.state.replace(params=restored["params"],
                                        opt_state=restored["opt_state"],
                                        step=int(restored["step"]))
        self._put_state()
        self.start_epoch = int(restored["epoch"]) + 1
        # Re-derive the curriculum level from the resume epoch (the saved
        # level predates the end-of-epoch bump), matching the reference's
        # target_level = min(start_epoch // 2, max) replay
        # (train_embedding_rag.py:325-336).
        self.level = min(self.start_epoch // self.cfg.curriculum_every,
                         self.cfg.max_level)

    def init_params_from(self, path: str) -> None:
        """Warm-start weights from a params-only checkpoint (a converted
        reference checkpoint from `convert-ckpt`, or another run's
        params) while keeping a fresh optimizer/epoch/curriculum —
        fine-tuning, as opposed to `restore_checkpoint`'s exact resume.
        The tree must match this trainer's model; any structure or shape
        mismatch fails loudly rather than loading a silently-wrong
        model."""
        from ..interop import load_params_checkpoint

        loaded = load_params_checkpoint(path)
        cur = self.state.params
        cur_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                     jax.tree_util.tree_flatten_with_path(cur)[0]}
        new_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                     jax.tree_util.tree_flatten_with_path(loaded)[0]}
        if cur_paths != new_paths:
            missing = sorted(set(cur_paths) - set(new_paths))[:5]
            extra = sorted(set(new_paths) - set(cur_paths))[:5]
            shapes = sorted(k for k in cur_paths if k in new_paths
                            and cur_paths[k] != new_paths[k])[:5]
            raise ValueError(
                f"checkpoint params do not match the model: "
                f"missing={missing} extra={extra} shape_mismatch={shapes}")
        params = jax.tree.map(lambda c, n: jnp.asarray(n, c.dtype),
                              cur, loaded)
        self.state = self.state.replace(params=params)
        self._put_state()

    # ---- logging ----

    def _log(self, record: dict) -> None:
        record = {**record, "ts": time.time()}
        with open(self.log_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")

    def _write_csv_row(self, row: dict) -> None:
        exists = os.path.exists(self.csv_path)
        with open(self.csv_path, "a", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=list(row.keys()))
            if not exists:
                w.writeheader()
            w.writerow(row)
