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

import dataclasses
import json
import time
from typing import Any, Callable

from ..io.freq import FreqTable
from ..io.vcf import VCFData, load_vcf_or_hdf5
from .imputer import Imputer


@dataclasses.dataclass
class ImputationService:
    """Resident imputation state + request loop."""

    imputer: Imputer
    ref_vcf: VCFData

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
        if rounds > 1:
            res = self.imputer.impute_progressive(target, rounds=rounds)
        else:
            res = self.imputer.impute(target)
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
