"""Persistent imputation service: load the model and reference panel once,
stream imputation requests through the resident jitted programs.

The reference has no serving layer (SURVEY.md section 1: "no serving
layer"); its inference entry reloads the model, rebuilds every per-window
FAISS index, and exits per run (src/infer_embedding_rag.py:53-257).  Here
the expensive state — checkpoint, reference panel, frequency table, the
compiled forward — is loaded once and reused: request latency is dominated
by the target's own VCF parse + the imputation math, not by setup.

Transport is deliberately minimal (JSON lines over stdin/stdout via the
``serve`` CLI subcommand, or the ``ImputationService`` API in-process):
this environment has no network egress, and a line protocol composes with
any socket/HTTP front-end.
"""

from __future__ import annotations

import collections
import dataclasses
import json
import threading
import time
from typing import Any, Callable

import numpy as np

from ..io.freq import FreqTable
from ..io.vcf import VCFData, load_vcf_or_hdf5
from .imputer import ImputationResult, Imputer


@dataclasses.dataclass
class ImputationService:
    """Resident imputation state + request loop."""

    imputer: Imputer
    ref_vcf: VCFData

    # True when handle() may be called from many threads at once (the
    # HTTP front-end keeps a global request lock otherwise).
    concurrent = False

    @classmethod
    def create(cls, model, embed_fn: Callable, params: Any,
               ref_vcf: VCFData, freq: FreqTable,
               **imputer_kw) -> "ImputationService":
        imp = Imputer(model, embed_fn, params, ref_vcf, freq, **imputer_kw)
        return cls(imputer=imp, ref_vcf=ref_vcf)

    def handle(self, request: dict) -> dict:
        """One request:
          {"target": <vcf/h5 path>, "output_vcf": <path>,
           "npy_prefix": <optional>, "progressive_rounds": <optional int>}
        Returns a JSON-able response dict.
        """
        t0 = time.time()
        target = load_vcf_or_hdf5(request["target"])
        rounds = int(request.get("progressive_rounds", 1))
        res = self.handle_target(target, rounds=rounds)
        if request.get("npy_prefix"):
            res.save_npy(request["npy_prefix"])
        if request.get("output_vcf"):
            res.write_vcf(request["output_vcf"], self.ref_vcf,
                          target.samples)
        return {"ok": True,
                "sites": int(res.pos.shape[0]),
                "samples": len(target.samples),
                "imputed_sites": int(res.imputed_flag.sum()),
                "seconds": round(time.time() - t0, 3)}

    def handle_target(self, target: VCFData,
                      rounds: int = 1) -> ImputationResult:
        """The device-facing half of ``handle`` (parse/write excluded) —
        the seam the batching front-end overrides."""
        if rounds > 1:
            return self.imputer.impute_progressive(target, rounds=rounds)
        return self.imputer.impute(target)

    def serve_lines(self, in_stream, out_stream) -> int:
        """JSON-lines request loop; returns the number of requests served.
        A blank line or EOF ends the loop; per-request errors are reported
        in-band, the service stays up."""
        n = 0
        for line in in_stream:
            line = line.strip()
            if not line:
                break
            try:
                resp = self.handle(json.loads(line))
            except Exception as e:  # keep serving
                resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            out_stream.write(json.dumps(resp) + "\n")
            out_stream.flush()
            n += 1
        return n


@dataclasses.dataclass
class _Pending:
    """One submitted target waiting for (or holding) its result."""

    target: VCFData
    key: int                      # hash of the target's site-pattern
    rounds: int = 1
    done: threading.Event = dataclasses.field(
        default_factory=threading.Event)
    result: ImputationResult | None = None
    error: BaseException | None = None


@dataclasses.dataclass
class BatchingImputationService(ImputationService):
    """Cross-request batched scheduling over one resident imputer.

    The plain service serializes requests behind one device pipeline, so
    two concurrent clients each see half the throughput AND the device
    idles while the other request's host work (VCF parse, result write)
    runs.  Here a scheduler thread owns the device stream:

      * Host work stays on the request threads — parse and VCF/NPY
        emission overlap another request's device compute.
      * Requests whose targets cover the SAME site pattern (e.g. cohorts
        from one genotyping chip) are merged along the sample axis and
        imputed as one call — imputation is per-sample independent, so
        splitting the probability matrices back per request is exact,
        and merged requests fill the fixed device batch instead of each
        padding it separately.
      * Incompatible patterns run back-to-back on the scheduler thread
        with no lock gaps between them.

    Progressive-refinement requests bypass merging (their working target
    mutates between rounds) but still queue through the scheduler.

    No reference analogue (it has no serving layer); this is the round-3
    throughput item from ROADMAP.md.
    """

    max_merge: int = 8            # max requests fused into one impute
    max_wait_ms: float = 25.0     # linger for merge partners

    concurrent = True

    def __post_init__(self):
        self._queue: collections.deque[_Pending] = collections.deque()
        self._cv = threading.Condition()
        self._closed = False
        self._merged_requests = 0   # requests that rode a shared impute
        self._impute_calls = 0
        self._thread = threading.Thread(target=self._scheduler_loop,
                                        daemon=True,
                                        name="impute-scheduler")
        self._thread.start()

    def close(self) -> None:
        """Stop the scheduler thread (idempotent).  Queued requests finish
        first; new ``handle_target`` calls are rejected."""
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- request side ----

    @staticmethod
    def _pattern_key(target: VCFData) -> int:
        return hash(target.pos.tobytes())

    def handle_target(self, target: VCFData,
                      rounds: int = 1) -> ImputationResult:
        if rounds > 1:
            # progressive: no merging, but serialize through the queue so
            # it doesn't interleave with a merged batch on the device
            item = _Pending(target=target, key=-1, rounds=rounds)
        else:
            item = _Pending(target=target, key=self._pattern_key(target))
        with self._cv:
            if self._closed:
                raise RuntimeError("BatchingImputationService is closed")
            self._queue.append(item)
            self._cv.notify()
        item.done.wait()
        if item.error is not None:
            raise item.error
        return item.result

    # ---- scheduler side ----

    def _take_group(self) -> list[_Pending]:
        """Pop a mergeable group: the head plus same-key neighbours that
        arrive within ``max_wait_ms`` (only lingering when the queue is
        otherwise empty — under load the batch forms by itself)."""
        with self._cv:
            while not self._queue:
                if self._closed:
                    return []
                self._cv.wait()
            head = self._queue.popleft()
            group = [head]
            if head.key == -1:
                return group
            deadline = time.monotonic() + self.max_wait_ms / 1000.0
            while len(group) < self.max_merge:
                # key match is a hash: confirm real position equality so
                # a (however unlikely) collision can never merge targets
                # with different site patterns
                i = next((j for j, it in enumerate(self._queue)
                          if it.key == head.key and np.array_equal(
                              it.target.pos, head.target.pos)), None)
                if i is not None:
                    del_item = self._queue[i]
                    del self._queue[i]
                    group.append(del_item)
                    continue
                remaining = deadline - time.monotonic()
                if remaining <= 0 or self._queue:
                    break       # incompatible work waiting: don't linger
                self._cv.wait(timeout=remaining)
            return group

    def _run_group(self, group: list[_Pending]) -> None:
        try:
            if len(group) == 1:
                it = group[0]
                it.result = ImputationService.handle_target(
                    self, it.target, rounds=it.rounds)
                it.done.set()
                return
            first = group[0].target
            merged = dataclasses.replace(
                first,
                gt=np.concatenate([it.target.gt for it in group], axis=1),
                samples=[s for it in group for s in it.target.samples])
            res = self.imputer.impute(merged)
            self._merged_requests += len(group)
            col = 0
            for it in group:
                n = it.target.n_samples
                it.result = ImputationResult(
                    hap1_prob=res.hap1_prob[:, col:col + n],
                    hap2_prob=res.hap2_prob[:, col:col + n],
                    gt_prob=res.gt_prob[:, col:col + n],
                    pos=res.pos,
                    imputed_flag=res.imputed_flag)
                col += n
                it.done.set()
        except BaseException as e:  # deliver the error to every waiter
            for it in group:
                if not it.done.is_set():
                    it.error = e
                    it.done.set()

    def _scheduler_loop(self) -> None:
        while True:
            group = self._take_group()
            if not group:       # closed and drained
                return
            self._impute_calls += 1
            self._run_group(group)

    @property
    def stats(self) -> dict:
        return {"impute_calls": self._impute_calls,
                "merged_requests": self._merged_requests}
