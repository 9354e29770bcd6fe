"""Online serving: batch retrieval / generation behind a tiny HTTP service.

The reference stops at offline `trainer.predict` (scripts/predict.py:18-56
writes a CSV); production serving is out of its scope. This module is the
TPU-framework counterpart: a dependency-free (stdlib-only) HTTP front-end
around the jit-compiled retrieval and autoregressive-generation paths.

Design (TPU-first):
  * jit-compiled steps have STATIC shapes — the engine pads every request
    batch to a fixed serving batch size and truncates/pads sequences to
    the model's max length (keeping the most recent items, matching the
    dataset's reverse-chronological truncation, data/dataset.py).
  * a coalescing batcher groups concurrent single requests into one
    device call: handler threads enqueue and block; a dispatcher drains
    the queue up to `batch_size` every `window_s`. One TPU program
    services many HTTP clients — the chip sees large batches, clients see
    small latencies.
  * the candidate (catalog-embedding) matrix is device-resident and
    refreshed explicitly via `refresh_candidates()` (mirrors the eval
    epoch refresh, reference models/retrieval.py:165-169) — cheap to call
    after a parameter swap.

Endpoints (JSON over HTTP):
  GET  /healthz                      -> {"status": "ok", ...}
  POST /v1/retrieve  {"sequences": [[id,...],...],
                      "timestamps": [[t,...],...]?, "k": int?}
                                     -> {"ids": [[...]], "scores": [[...]]}
  POST /v1/generate  {"sequences": ..., "timestamps": ...?, "steps": int,
                      "mode": "greedy"|"sample"|"beam",
                      "temperature"/"top_k"/"top_p"/"num_beams"?, "seed"?}
                                     -> {"ids": [[...]]}
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from mygenerativerecommenders_tpu.configs import Config
from mygenerativerecommenders_tpu.models import decode
from mygenerativerecommenders_tpu.train.task_retrieval import (
    make_candidate_fn,
    make_eval_step,
)
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch


class ServingEngine:
    """Model + params + jitted serving programs with static batch shape."""

    def __init__(
        self,
        model,
        params,
        cfg: Config,
        all_item_ids: np.ndarray,
        max_item_id: int,
        batch_size: int = 32,
        mesh=None,
    ):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.batch_size = int(batch_size)
        self.max_len = int(cfg.data.max_sequence_length)
        self.all_item_ids = np.asarray(all_item_ids, dtype=np.int32)
        self.max_item_id = int(max_item_id)
        # mesh: sharded-table configs keep the candidate matrix row-
        # sharded and serve top-k via the per-shard merge (index.sharded)
        self._eval_step = make_eval_step(
            model, cfg, all_item_ids, max_item_id, mesh=mesh
        )
        self._candidate_fn = make_candidate_fn(
            model, cfg, all_item_ids, mesh=mesh
        )
        self._generate_cache: Dict[tuple, Callable] = {}
        self.refresh_candidates()

    def refresh_candidates(self) -> None:
        """Rebuild the device-resident candidate matrix from current params."""
        self.candidates = self._candidate_fn(self.params)

    def swap_params(self, params) -> None:
        """Hot-swap model weights (e.g. after a checkpoint reload)."""
        self.params = params
        self.refresh_candidates()

    # -- request assembly ---------------------------------------------------

    def _pack(
        self,
        sequences: Sequence[Sequence[int]],
        timestamps: Optional[Sequence[Sequence[int]]],
    ) -> Tuple[Dict[str, np.ndarray], int]:
        """Pad/truncate raw id (and timestamp) lists into a loader batch."""
        n_real = len(sequences)
        if n_real == 0:
            raise ValueError("empty request: 'sequences' has no rows")
        if n_real > self.batch_size:
            raise ValueError(
                f"request rows {n_real} > serving batch size {self.batch_size}"
            )
        b, l = self.batch_size, self.max_len
        ids = np.zeros((b, l), dtype=np.int32)
        ts = np.zeros((b, l), dtype=np.int32)
        lengths = np.zeros(b, dtype=np.int32)
        for i, row in enumerate(sequences):
            row = list(row)[-l:]  # keep the most recent items
            if not row:
                raise ValueError(f"sequences[{i}] is empty")
            lengths[i] = len(row)
            ids[i, : len(row)] = row
            if timestamps is not None:
                trow = list(timestamps[i])[-l:]
                if len(trow) != len(row):
                    raise ValueError(
                        f"timestamps[{i}] length {len(trow)} != sequence "
                        f"length {len(row)}"
                    )
                ts[i, : len(trow)] = trow
            else:
                # monotone defaults so the relative time bias is well-formed
                ts[i, : len(row)] = np.arange(1, len(row) + 1)
        lengths = np.maximum(lengths, 1)  # padding rows need length >= 1
        batch = {
            "lengths": lengths,
            "ids": ids,
            "ratings": np.zeros((b, l), dtype=np.int32),
            "timestamps": ts,
            "target_id": np.zeros(b, dtype=np.int32),
            "target_rating": np.zeros(b, dtype=np.int32),
            # the query position's "next-item" timestamp: last seen + 1
            "target_timestamp": (ts.max(axis=1) + 1).astype(np.int32),
            "sample_weight": (np.arange(b) < n_real).astype(np.float32),
        }
        return batch, n_real

    # -- serving calls ------------------------------------------------------

    def retrieve(
        self,
        sequences: Sequence[Sequence[int]],
        timestamps: Optional[Sequence[Sequence[int]]] = None,
        k: Optional[int] = None,
    ) -> Tuple[List[List[int]], List[List[float]]]:
        """Top-k next-item retrieval for raw id sequences."""
        batch, n_real = self._pack(sequences, timestamps)
        top_ids, top_scores = self._eval_step(self.params, batch, self.candidates)
        top_ids = np.asarray(top_ids)[:n_real]
        top_scores = np.asarray(top_scores)[:n_real]
        if k is not None:
            k = max(1, min(int(k), top_ids.shape[1]))
            top_ids, top_scores = top_ids[:, :k], top_scores[:, :k]
        return top_ids.tolist(), [
            [float(s) for s in row] for row in top_scores.tolist()
        ]

    def _generate_fn(self, mode: str, steps: int, **kw) -> Callable:
        """jit-compile (and cache) one generation program per config."""
        key = (mode, steps, tuple(sorted(kw.items())))
        if key in self._generate_cache:
            return self._generate_cache[key]
        max_out = self.cfg.model.gr_output_length + 1
        model, max_item_id = self.model, self.max_item_id
        candidate_ids = self.all_item_ids

        if mode == "greedy":
            def run(params, batch, candidates, rng):
                seq, _, _ = seq_features_from_batch(batch, max_out)
                return decode.greedy_generate(
                    model, params, seq, candidates, candidate_ids,
                    steps=steps, max_item_id=max_item_id,
                )
        elif mode == "sample":
            def run(params, batch, candidates, rng):
                seq, _, _ = seq_features_from_batch(batch, max_out)
                return decode.sample_generate(
                    model, params, seq, candidates, candidate_ids,
                    steps=steps, max_item_id=max_item_id, rng=rng,
                    temperature=kw.get("temperature", 1.0),
                    top_k=kw.get("top_k", 0),
                    top_p=kw.get("top_p", 0.0),
                )
        elif mode == "beam":
            def run(params, batch, candidates, rng):
                seq, _, _ = seq_features_from_batch(batch, max_out)
                ids, _ = decode.beam_generate(
                    model, params, seq, candidates, candidate_ids,
                    steps=steps, max_item_id=max_item_id,
                    num_beams=kw.get("num_beams", 4),
                )
                return ids
        else:
            raise ValueError(
                f"unknown generation mode {mode!r}; "
                "expected greedy | sample | beam"
            )
        fn = jax.jit(run)
        self._generate_cache[key] = fn
        return fn

    def generate(
        self,
        sequences: Sequence[Sequence[int]],
        timestamps: Optional[Sequence[Sequence[int]]] = None,
        steps: int = 1,
        mode: str = "greedy",
        seed: int = 0,
        **kw,
    ) -> List[List[int]]:
        """Autoregressive multi-step generation (greedy/sample/beam)."""
        steps = int(steps)
        if not 1 <= steps <= self.cfg.model.gr_output_length + 1:
            raise ValueError(
                f"steps {steps} outside [1, {self.cfg.model.gr_output_length + 1}]"
                " (the model's generative output window)"
            )
        batch, n_real = self._pack(sequences, timestamps)
        fn = self._generate_fn(mode, steps, **kw)
        # decode scores against exact f32 rows; with index.quantize the
        # candidate pytree carries them in .exact (retrieval pre-ranks on
        # the int8 rows, generation stays exact)
        candidates = getattr(self.candidates, "exact", self.candidates)
        if candidates is None:
            # a QuantizedCatalog built with keep_exact=False has no f32
            # rows; passing None into the jitted decode fn would fail
            # with an opaque trace error
            raise RuntimeError(
                "generation requires exact f32 candidate rows; the loaded "
                "quantized catalog was built with keep_exact=False"
            )
        ids = fn(self.params, batch, candidates, jax.random.PRNGKey(seed))
        return np.asarray(ids)[:n_real].tolist()


class _Coalescer:
    """Groups concurrent single-row requests into one device call.

    Handler threads `submit()` rows and block; a dispatcher thread drains
    up to `max_rows` rows every `window_s` and invokes `run_batch` once.
    """

    def __init__(self, run_batch: Callable, max_rows: int, window_s: float = 0.002):
        self._run_batch = run_batch
        self._max_rows = max_rows
        self._window_s = window_s
        self._pending: List[dict] = []
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, row: dict) -> dict:
        entry = {"row": row, "done": threading.Event(), "result": None, "error": None}
        with self._lock:
            self._pending.append(entry)
        self._wake.set()
        entry["done"].wait()
        if entry["error"] is not None:
            raise entry["error"]
        return entry["result"]

    def _loop(self):
        while not self._stop:
            self._wake.wait(timeout=0.1)
            self._wake.clear()
            if self._stop:
                return
            time.sleep(self._window_s)  # let concurrent requests pile up
            with self._lock:
                batch, self._pending = (
                    self._pending[: self._max_rows],
                    self._pending[self._max_rows:],
                )
                if self._pending:
                    self._wake.set()  # more waiting: run again immediately
            if not batch:
                continue
            try:
                results = self._run_batch([e["row"] for e in batch])
                for entry, result in zip(batch, results):
                    entry["result"] = result
                    entry["done"].set()
            except Exception as exc:  # surface to every waiter
                for entry in batch:
                    entry["error"] = exc
                    entry["done"].set()

    def shutdown(self):
        self._stop = True
        self._wake.set()


class RecommenderHTTPServer:
    """stdlib ThreadingHTTPServer wired to a ServingEngine."""

    def __init__(self, engine: ServingEngine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self._coalescer = _Coalescer(self._run_retrieve_rows, engine.batch_size)
        handler = _make_handler(engine, self._coalescer)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def _run_retrieve_rows(self, rows: List[dict]) -> List[dict]:
        seqs = [r["sequence"] for r in rows]
        tss = [r.get("timestamps") for r in rows]
        if any(t is None for t in tss):
            tss = None
        ids, scores = self.engine.retrieve(seqs, tss)
        out = []
        for i, row in enumerate(rows):
            k = row.get("k")
            ids_i, sc_i = ids[i], scores[i]
            if k is not None:
                k = max(1, min(int(k), len(ids_i)))
                ids_i, sc_i = ids_i[:k], sc_i[:k]
            out.append({"ids": ids_i, "scores": sc_i})
        return out

    def start(self) -> "RecommenderHTTPServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._coalescer.shutdown()
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def serve_forever(self):
        self.httpd.serve_forever()


def _make_handler(engine: ServingEngine, coalescer: _Coalescer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_json(self) -> dict:
            length = int(self.headers.get("Content-Length", 0))
            if length == 0:
                return {}
            return json.loads(self.rfile.read(length))

        def do_GET(self):
            if self.path == "/healthz":
                self._send(
                    200,
                    {
                        "status": "ok",
                        "batch_size": engine.batch_size,
                        "max_sequence_length": engine.max_len,
                        "catalog_size": int(engine.all_item_ids.shape[0]),
                    },
                )
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                req = self._read_json()
                if self.path == "/v1/retrieve":
                    seqs = req.get("sequences")
                    if isinstance(seqs, list) and len(seqs) == 1:
                        # single-row requests ride the coalescer so many
                        # concurrent clients share one device call
                        row = {"sequence": seqs[0], "k": req.get("k")}
                        if req.get("timestamps"):
                            row["timestamps"] = req["timestamps"][0]
                        result = coalescer.submit(row)
                        self._send(
                            200,
                            {"ids": [result["ids"]], "scores": [result["scores"]]},
                        )
                        return
                    ids, scores = engine.retrieve(
                        seqs, req.get("timestamps"), k=req.get("k")
                    )
                    self._send(200, {"ids": ids, "scores": scores})
                elif self.path == "/v1/generate":
                    known = {"sequences", "timestamps", "steps", "mode", "seed"}
                    kw = {
                        key: value
                        for key, value in req.items()
                        if key not in known
                    }
                    ids = engine.generate(
                        req.get("sequences"),
                        req.get("timestamps"),
                        steps=req.get("steps", 1),
                        mode=req.get("mode", "greedy"),
                        seed=req.get("seed", 0),
                        **kw,
                    )
                    self._send(200, {"ids": ids})
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
            except (ValueError, TypeError, KeyError) as exc:
                self._send(400, {"error": str(exc)})
            except Exception as exc:  # pragma: no cover - defensive
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def serve(
    engine: ServingEngine, host: str = "127.0.0.1", port: int = 8000
) -> RecommenderHTTPServer:
    """Start (and return) a background HTTP server around `engine`."""
    return RecommenderHTTPServer(engine, host, port).start()
