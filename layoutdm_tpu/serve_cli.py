"""Layout-generation server — the production-serving surface.

The reference has no serving story (research CLIs only); this wraps the
compiled sampler in a minimal stdlib HTTP endpoint so a trained job can be
deployed as a service:

    python -m layoutdm_tpu.serve_cli job_dir=<dir> port=8700 [warm_tasks=c]
        [timestep_ladder=25,50,100]

Endpoints
---------
GET  /healthz            -> {"status": "ok", "model": ..., "dataset": ...}
POST /generate           -> JSON layouts
        {"task": "unconditional" | "c" | "cwh" | "partial" | "refinement"
                 | "relation",
         "batch_size": int,                (default 1, <= max_batch_size)
         "seed": int,                      (optional)
         "num_timesteps": int,             (optional quality/latency knob:
                                            must be in the service's
                                            timestep ladder — each ladder
                                            value is one precompiled
                                            skip-step program, measured
                                            linear: T=25 is ~4x faster
                                            than T=100)
         "layout": {                       (required for conditional tasks)
            "label": [[int, ...]],         per-sample category ids
            "bbox":  [[[x,y,w,h], ...]],   normalized xywh
                                           (optional for task=relation,
                                            which conditions on labels only)
         },
         "relations": [                    (task=relation: pairwise
            {"src": int | "canvas",         constraints steering CLG-LO
             "dst": int,                    guidance; indices are 0-based
             "size": "smaller" | "equal"    into layout.label; semantics:
                     | "larger",            "dst is <size> than src" /
             "loc": "left" | "top"          "dst is <loc> of src" — with
                    | "right" | "bottom"    src="canvas", loc means the
                    | "center"}, ...]}      dst's region on the canvas
                                            (top/center/bottom)
     -> {"layouts": [{"label": [...], "bbox": [[x,y,w,h], ...]}, ...],
         "ms_per_sample": float,
         "violation_rate": float}          (task=relation only: fraction of
                                            the requested constraints the
                                            returned layouts violate)

Design: every request is lowered to per-row (cond, seed) pairs and runs
through ONE compiled program per lane (ladder rung × guided × init mode),
padded to a fixed batch width (first compile happens at startup via a
warmup request, not on a client's clock).  Sampling is row-keyed — each
row's trajectory depends only on its own seed — so a **request coalescer**
batches concurrent requests into one program run: N batch-1 clients cost
one reverse chain, not N, multiplying capacity at high concurrency while
keeping per-request seed determinism independent of batch-mates.  The TPU
worker is a single thread (the device is serial anyway); HTTP handling is
threaded so requests can queue AT the coalescer, not in the socket backlog.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from layoutdm_tpu.configs import SamplingConfig
from layoutdm_tpu.tasks import get_cond, to_sampler_cond

logger = logging.getLogger(__name__)

COND_TASKS = ("c", "cwh", "partial", "refinement", "relation")

# request-schema names for the bit-encoded relation vocabulary
# (`data/relations.py` RelSize/RelLoc, = reference `data/util.py:14-30`)
_SIZE_REL = {"smaller": 1, "equal": 2, "larger": 3}  # RelSize values
_LOC_REL = {"left": 5, "top": 6, "right": 7, "bottom": 8, "center": 9}

def _parse_relations(relations, n_elements: int, max_edges: int):
    """Client relation list -> padded (edge_index, edge_attr, edge_mask)
    arrays over the canvas-prepended element indexing (canvas=0, client
    element i -> i+1)."""
    from layoutdm_tpu.data.relations import REL_UNK, pad_edges

    if not isinstance(relations, (list, tuple)):
        raise ValueError("'relations' must be a list of constraint objects")
    if len(relations) > max_edges:
        raise ValueError(
            f"too many relations: {len(relations)} > max_edges ({max_edges})"
        )
    ei, ea = [], []
    for k, r in enumerate(relations):
        if not isinstance(r, dict):
            raise ValueError(f"relation {k}: expected an object")
        src, dst = r.get("src"), r.get("dst")
        if dst == "canvas":
            raise ValueError(
                f"relation {k}: 'canvas' is only valid as src (constraints "
                "place elements relative to the canvas, not vice versa)"
            )

        def _element_index(name, v):
            # validate the RAW client value: a negative index (e.g. -1)
            # must be rejected here, not silently wrap into the canvas
            # slot after the +1 shift below
            if (
                not isinstance(v, int)
                or isinstance(v, bool)
                or not (0 <= v < n_elements)
            ):
                raise ValueError(
                    f"relation {k}: {name} out of range "
                    f"(0..{n_elements - 1} or 'canvas')"
                )
            return v + 1  # canvas-prepended indexing: element i -> i+1

        si = 0 if src == "canvas" else _element_index("src", src)
        di = _element_index("dst", dst)
        if si == di:
            raise ValueError(f"relation {k}: src == dst")
        size, loc = r.get("size"), r.get("loc")
        if size is not None and size not in _SIZE_REL:
            raise ValueError(
                f"relation {k}: unknown size '{size}' "
                f"(one of {'/'.join(_SIZE_REL)})"
            )
        if loc is not None and loc not in _LOC_REL:
            raise ValueError(
                f"relation {k}: unknown loc '{loc}' "
                f"(one of {'/'.join(_LOC_REL)})"
            )
        attr = (1 << (_SIZE_REL[size] if size else 0)) | (
            1 << (_LOC_REL[loc] if loc else 4)
        )
        if attr == REL_UNK:
            raise ValueError(f"relation {k}: needs 'size' and/or 'loc'")
        ei.append((si, di))
        ea.append(attr)
    return pad_edges(
        np.asarray(ei, np.int32).reshape(-1, 2),
        np.asarray(ea, np.int32),
        max_edges,
    )


def _row_seeds(seed: int, n: int) -> np.ndarray:
    """Per-row uint32 seeds derived from the request seed (splitmix-style
    mix).  A row's stream depends only on (request seed, row index) — the
    invariant that lets rows from different requests share one program run
    without coupling their randomness."""
    i = np.arange(1, n + 1, dtype=np.uint32)
    x = np.uint32(seed) + i * np.uint32(0x9E3779B9)
    x ^= x >> np.uint32(16)
    x *= np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(13)
    x *= np.uint32(0xC2B2AE35)
    x ^= x >> np.uint32(16)
    return x


class LayoutHTTPServer(ThreadingHTTPServer):
    """Threaded front with a deep accept backlog: the stdlib default
    (request_queue_size=5) RSTs connections when a burst of clients
    arrives while the GIL is busy with host-side array work."""

    daemon_threads = True
    request_queue_size = 128


class ServiceOverloaded(RuntimeError):
    """Raised when the coalescer queue is full (mapped to HTTP 503)."""


class _Pending:
    """One request's rows queued at the coalescer."""

    __slots__ = ("cond", "seeds", "seed", "event", "result", "error", "sec")

    def __init__(self, cond, seeds, seed=0):
        self.cond = cond  # host-numpy SamplerCond, leading dim = n rows
        self.seeds = seeds  # (n,) uint32
        self.seed = int(seed)  # the request-level seed (whole-batch lanes)
        self.event = threading.Event()
        self.result = None  # decoded dict sliced to this request's rows
        self.error = None
        self.sec = 0.0  # wall time of the shared program run


class LayoutService:
    """Owns the model, params, and the compiled samplers."""

    def __init__(
        self,
        job_dir: str,
        max_batch_size: int = 64,
        sampling: Optional[SamplingConfig] = None,
        warm_tasks=("unconditional",),
        timestep_ladder=(),
        max_edges: int = 32,
        coalesce_window_ms: float = 2.0,
        request_timeout_s: float = 600.0,
        max_queued_requests: int = 256,
    ):
        from layoutdm_tpu.factory import build_model, build_tokenizer
        from layoutdm_tpu.train import checkpoint as ckpt

        self.train_cfg = ckpt.load_config(job_dir)
        self.train_cfg.data.pad_until_max = True
        self.tokenizer = build_tokenizer(self.train_cfg)
        self.model = build_model(self.train_cfg, self.tokenizer)
        template = self.model.init(jax.random.PRNGKey(0))
        self.params = ckpt.load_params(template, job_dir, "best")
        self.sampling = sampling or SamplingConfig(name="random")
        self.B = int(max_batch_size)
        # allowed per-request num_timesteps values (a bounded set: each is
        # one compiled program — an open set would let clients compile-bomb
        # the service)
        self.ladder = tuple(sorted({int(t) for t in timestep_ladder}))
        # diffusion models can't evaluate beyond their trained T; the
        # iterative baselines (MaskGIT/BLT) take any positive step count
        T_train = getattr(getattr(self.model, "q", None), "num_timesteps", None)
        for t in self.ladder:
            if t < 1 or (T_train is not None and t > T_train):
                raise ValueError(
                    f"timestep_ladder rung {t} out of range: must satisfy "
                    f"0 < t <= num_timesteps ({T_train}) of the trained model"
                )
        self._counter = 0
        self._counter_lock = threading.Lock()  # handlers run threaded
        self.request_timeout_s = float(request_timeout_s)
        self.max_queued_requests = int(max_queued_requests)
        # models whose sampler consumes (B,)-batched per-row keys
        # (the diffusion sampler's `sample_chain`) can coalesce requests;
        # the baseline zoo splits a single whole-batch key internally, so
        # those lanes run one request per program (pre-coalescer semantics)
        self._per_row = bool(
            getattr(self.model, "supports_per_row_keys", False)
        )
        # ONE compiled program per lane (t_eval, guided, init-mode) covering
        # per-row key derivation + reverse chain + tokenizer.decode.
        # Composing these eagerly costs a dispatch per jnp op — on a
        # remote-TPU path with a ~30 ms invocation floor (docs/DESIGN.md §5)
        # that was ~1 s of fixed per-request latency before the chain ran.
        self._run_cache: Dict = {}
        # relation task: a fixed edge capacity so every request reuses the
        # one compiled guided program, and ONE stable guidance closure
        # (per-request graphs ride in the cond pytree, not the closure)
        self.max_edges = int(max_edges)
        from layoutdm_tpu.relation.guidance import make_relation_guidance

        self._guidance = make_relation_guidance(self.tokenizer, self.sampling)

        # request coalescer: a single TPU-worker thread drains a queue of
        # per-request row groups, packing same-lane groups into one padded
        # program run.  `coalesce_window_ms` is how long the worker lingers
        # after picking up work to let concurrent requests join the batch.
        self.coalesce_window_ms = float(coalesce_window_ms)
        self._cv = threading.Condition()
        self._queue: List[Tuple[tuple, _Pending]] = []
        self._stop = False
        self.runs = 0  # program invocations (observability + tests)
        self._worker = threading.Thread(
            target=self._worker_loop, name="tpu-worker", daemon=True
        )
        self._worker.start()

        # conditional tasks need a layout — warm them with a trivial one
        dummy_layout = {"label": [0], "bbox": [[0.5, 0.5, 0.2, 0.2]]}
        dummy_rel = [{"src": "canvas", "dst": 0, "loc": "top"}]
        for task in warm_tasks:
            lay = None if task == "unconditional" else dummy_layout
            rel = dummy_rel if task == "relation" else None
            logger.info("warmup compile: %s", task)
            self.generate(task, min(4, self.B), seed=0, layout=lay,
                          relations=rel)
            for t in self.ladder:
                logger.info("warmup compile: %s T=%d", task, t)
                self.generate(
                    task, min(4, self.B), seed=0, layout=lay,
                    num_timesteps=t, relations=rel,
                )
        logger.info("service ready (batch=%d)", self.B)

    # -- coalescing TPU worker ----------------------------------------------
    def _worker_loop(self):
        """The single device thread: drain the queue, packing same-lane
        request row-groups into one padded program run."""
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait(0.05)
                if self._stop:
                    return
                lane = self._queue[0][0]
            if self.coalesce_window_ms > 0:
                # linger so concurrent requests can join this batch
                time.sleep(self.coalesce_window_ms / 1e3)
            with self._cv:
                take, rest, used = [], [], 0
                for ln, p in self._queue:
                    if (
                        ln == lane
                        and used + len(p.seeds) <= self.B
                        # whole-batch-keyed models: one request per run, so
                        # a request's randomness never depends on batch-mates
                        and (self._per_row or not take)
                    ):
                        take.append(p)
                        used += len(p.seeds)
                    else:
                        rest.append((ln, p))
                self._queue = rest
            if not take:
                # every queued request for this lane was withdrawn (client
                # timeout) between pickup and packing — nothing to run
                continue
            try:
                self._run_batch(lane, take)
            except BaseException as e:
                for p in take:
                    p.error = e
            finally:
                for p in take:
                    p.event.set()

    def _pad_cond(
        self, n: int, guided: bool, init_from_seq: bool, has_weak: bool = False
    ):
        """No-op rows used to pad a coalesced batch to the program width.

        Unless the lane carries a refinement prior (`has_weak`), weak_logits
        rides as a broadcastable (n, 1, 1) zero instead of a dense
        (n, S, V) f32 block — the dense block is ~70 KB/row that would be
        rebuilt and re-uploaded through the remote-TPU tunnel on EVERY
        program run (measured +50 ms/request before slimming)."""
        from layoutdm_tpu.models.diffusion.sampler import SamplerCond

        S, V = self.model.seq_len, self.model.num_classes
        wshape = (n, S, V) if has_weak else (n, 1, 1)
        c = SamplerCond(
            seq=np.zeros((n, S), np.int32),
            strong_mask=np.zeros((n, S), bool),
            weak_logits=np.zeros(wshape, np.float32),
            weak_mask=np.zeros((n, S), bool),
            pad_suppress=np.zeros((n, S), bool),
            init_from_seq=init_from_seq,
        )
        if guided:
            E = self.max_edges
            c = c.replace(
                relation=(
                    np.zeros((n, E, 2), np.int32),  # edge_index
                    np.zeros((n, E), np.int32),  # edge_attr
                    np.zeros((n, E), bool),  # edge_mask (all inactive)
                    np.zeros((n, E), bool),  # src_is_canvas
                )
            )
        return c

    def _lane_program(self, lane):
        """The one compiled program for (t_eval, guided, init mode): per-row
        PRNG keys from uint32 seeds -> reverse chain -> decode."""
        fn = self._run_cache.get(lane)
        if fn is None:
            t_eval, guided = lane[0], lane[1]
            guidance_fn = self._guidance if guided else None

            if self._per_row:

                def run(params, seeds, cond):
                    keys = jax.vmap(jax.random.PRNGKey)(seeds)
                    ids = self.model.sample_ids(
                        params, keys, self.B, cond=cond,
                        sampling=self.sampling,
                        num_timesteps_eval=t_eval, guidance_fn=guidance_fn,
                    )
                    return self.tokenizer.decode(ids)

            else:
                # baseline zoo: the sampler splits ONE key internally
                # (per-row key arrays would crash `jax.random.split`), so
                # the whole padded batch runs under the request's key
                def run(params, seed, cond):
                    ids = self.model.sample_ids(
                        params, jax.random.PRNGKey(seed), self.B, cond=cond,
                        sampling=self.sampling,
                        num_timesteps_eval=t_eval, guidance_fn=guidance_fn,
                    )
                    return self.tokenizer.decode(ids)

            fn = jax.jit(run)
            self._run_cache[lane] = fn
        return fn

    def _run_batch(self, lane, pendings: List[_Pending]):
        _, guided, init_from_seq, has_weak = lane
        n_rows = sum(len(p.seeds) for p in pendings)
        conds = [p.cond for p in pendings]
        seeds = [p.seeds for p in pendings]
        if n_rows < self.B:
            conds.append(
                self._pad_cond(
                    self.B - n_rows, guided, init_from_seq, has_weak
                )
            )
            seeds.append(np.zeros(self.B - n_rows, np.uint32))
        stacked = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *conds)
        fn = self._lane_program(lane)
        if self._per_row:
            rng_arg = np.concatenate(seeds)
        else:
            # one request per run (see _worker_loop): its scalar seed keys
            # the whole padded batch, exactly the pre-coalescer semantics
            rng_arg = np.int32(pendings[0].seed)
        t0 = time.perf_counter()
        out = jax.device_get(fn(self.params, rng_arg, stacked))
        sec = time.perf_counter() - t0
        self.runs += 1
        off = 0
        for p in pendings:
            n = len(p.seeds)
            p.result = {k: v[off : off + n] for k, v in out.items()}
            p.sec = sec
            off += n

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join(timeout=5)

    # -- request handling ----------------------------------------------------
    def _build_cond(
        self, task: str, layout: Optional[Dict], B: int, relations=None
    ):
        """Returns (sampler cond, canvas-graph dict or None).  The graph dict
        (relation task only) carries the canvas-prepended labels + padded
        edges used for guidance and the response's violation_rate."""
        if task == "unconditional":
            return None, None
        if layout is None:
            raise ValueError(f"task '{task}' requires a 'layout'")
        label = np.asarray(layout["label"], np.int32)
        if task == "relation" and "bbox" not in layout:
            # relation conditions on categories only; boxes are synthesized
            bbox = np.zeros(label.shape + (4,), np.float32)
        else:
            bbox = np.asarray(layout["bbox"], np.float32)
        if label.ndim == 1:
            label, bbox = label[None], bbox[None]
        n, S = label.shape[1], self.tokenizer.max_elements
        if n > S:
            raise ValueError(f"too many elements: {n} > {S}")
        pad = S - n
        batch = {
            "label": np.pad(label, ((0, 0), (0, pad))),
            "bbox": np.pad(bbox, ((0, 0), (0, pad), (0, 0))),
            "mask": np.pad(
                np.ones_like(label, bool), ((0, 0), (0, pad))
            ),
        }
        # broadcast one condition to the whole padded batch (demo-notebook
        # semantics, `task.py:235-248`)
        if label.shape[0] == 1:
            batch = {k: np.repeat(v, B, axis=0) for k, v in batch.items()}
        elif label.shape[0] != B:
            # reject HERE (a 400 for this client) — a mismatched cond/seed
            # row count would otherwise fail at trace time inside the
            # worker, 500-ing every coalesced batch-mate too
            raise ValueError(
                f"layout has {label.shape[0]} rows but batch_size is {B}: "
                "provide ONE layout to broadcast, or exactly batch_size"
            )
        cond = get_cond(
            jax.random.PRNGKey(0), batch, self.tokenizer, task
        )
        sc = to_sampler_cond(cond, self.tokenizer, self.sampling)
        if task != "relation":
            return sc, None
        # canvas-prepended indexing for the constraint graph (canvas = 0,
        # client element i -> i+1) — the SAME transform the training/eval
        # paths use, so the conventions cannot drift
        from layoutdm_tpu.data.transforms import AddCanvasElement
        from layoutdm_tpu.relation.guidance import RelationData

        n = int(label.shape[1])
        edges = _parse_relations(relations or [], n, self.max_edges)
        with_canvas = AddCanvasElement()(None, dict(batch))
        graph = {
            "label": with_canvas["label"].astype(np.int32),
            "edge_index": np.repeat(edges["edge_index"][None], B, axis=0),
            "edge_attr": np.repeat(edges["edge_attr"][None], B, axis=0),
            "edge_mask": np.repeat(edges["edge_mask"][None], B, axis=0),
        }
        sc = sc.replace(relation=tuple(RelationData.from_batch(graph)))
        return sc, graph

    def generate(
        self, task: str, batch_size: int, seed: Optional[int], layout,
        num_timesteps: Optional[int] = None, relations=None,
    ) -> Dict:
        if task != "unconditional" and task not in COND_TASKS:
            raise ValueError(
                f"unknown task '{task}' (one of unconditional/{'/'.join(COND_TASKS)})"
            )
        if num_timesteps is not None:
            if (
                not float(num_timesteps).is_integer()
                or int(num_timesteps) not in self.ladder
            ):
                raise ValueError(
                    f"num_timesteps {num_timesteps} not in the service ladder "
                    f"{list(self.ladder)} (start with timestep_ladder=...)"
                )
        B = min(int(batch_size), self.B)
        if B < 1:
            raise ValueError("batch_size must be >= 1")
        if seed is None:
            # handlers run on ThreadingHTTPServer threads — an unlocked
            # read-modify-write could hand two seedless requests the same
            # auto-seed (identical layouts for two independent clients)
            with self._counter_lock:
                self._counter += 1
                seed = self._counter

        if task == "relation":
            if not relations:
                raise ValueError(
                    "task 'relation' requires a non-empty 'relations' list"
                )
            if not getattr(self.model, "supports_guidance", False):
                raise ValueError(
                    f"model '{self.train_cfg.model.name}' does not support "
                    "relation guidance (diffusion-only, like the reference's "
                    "CLG-LO)"
                )
        # fold arbitrary python ints into int32 range (np.int32(2**31)
        # raises OverflowError on NumPy 2)
        seed32 = np.int32(int(seed) & 0x7FFFFFFF)

        # lower to per-row (cond, seed) and enqueue at the coalescer: rows
        # are built at the REQUEST's size; the worker packs same-lane
        # requests together and pads the batch to the program width
        has_weak = task == "refinement"
        cond, graph = self._build_cond(task, layout, B, relations)
        if cond is None:
            cond = self._pad_cond(B, False, False)
        else:
            cond = jax.tree.map(np.asarray, cond)  # host rows for stacking
            if not has_weak:
                # slim the all-zero prior to a broadcastable scalar row
                # (see _pad_cond) — the sampler's `where(weak_mask, ...)`
                # broadcasts it back
                cond = cond.replace(
                    weak_logits=np.zeros((B, 1, 1), np.float32)
                )
        t_eval = int(num_timesteps) if num_timesteps is not None else None
        guided = task == "relation"
        lane = (t_eval, guided, bool(cond.init_from_seq), has_weak)

        p = _Pending(cond, _row_seeds(int(seed32), B), seed=int(seed32))
        with self._cv:
            if len(self._queue) >= self.max_queued_requests:
                raise ServiceOverloaded(
                    f"queue full ({self.max_queued_requests} requests)"
                )
            self._queue.append((lane, p))
            self._cv.notify_all()
        if not p.event.wait(timeout=self.request_timeout_s):
            # withdraw from the queue so the worker doesn't later burn a
            # program run on a request whose client is long gone
            with self._cv:
                self._queue = [
                    (ln, q) for ln, q in self._queue if q is not p
                ]
            raise RuntimeError("generation timed out")
        if p.error is not None:
            raise RuntimeError(f"generation failed: {p.error!r}") from p.error
        out = p.result
        bbox, label, mask = out["bbox"], out["label"], out["mask"]

        layouts = []
        for i in range(B):
            m = mask[i]
            layouts.append(
                {
                    "label": label[i][m].tolist(),
                    "bbox": np.round(bbox[i][m], 4).tolist(),
                }
            )
        resp = {
            "layouts": layouts,
            # wall time of the (possibly shared) program run, amortized over
            # the full program width — the marginal cost of one more row
            "ms_per_sample": round(p.sec * 1e3 / self.B, 2),
            # the seed actually consumed: int(seed) & 0x7FFFFFFF aliases
            # client seeds differing only in sign/high bits, so determinism
            # claims must reference THIS value, not the request's
            "seed": int(seed32),
        }
        if graph is not None:
            # how many of the requested constraints the returned layouts
            # violate (canvas-prepended indexing, like `sample_cli`)
            from layoutdm_tpu.data.transforms import AddCanvasElement
            from layoutdm_tpu.eval.metrics import compute_violation

            S1 = graph["label"].shape[1]
            gen = np.zeros((B, S1, 4), np.float32)
            gen[:, 0] = AddCanvasElement.x
            gen[:, 1:] = bbox
            v = compute_violation(
                gen, graph["label"], graph["edge_index"],
                graph["edge_attr"], graph["edge_mask"],
            )
            v = v[~np.isnan(v)]
            resp["violation_rate"] = round(float(v.mean()), 4) if v.size else 0.0
        return resp

    def info(self) -> Dict:
        return {
            "status": "ok",
            "model": self.train_cfg.model.name,
            "dataset": self.train_cfg.dataset.name,
            "max_elements": self.tokenizer.max_elements,
            "max_batch_size": self.B,
            "timestep_ladder": list(self.ladder),
            "max_edges": self.max_edges,
            "coalesce_window_ms": self.coalesce_window_ms,
            "coalescing": self._per_row,
            "program_runs": self.runs,
        }


def make_handler(service: LayoutService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: Dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, service.info())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                out = service.generate(
                    req.get("task", "unconditional"),
                    req.get("batch_size", 1),
                    req.get("seed"),
                    req.get("layout"),
                    req.get("num_timesteps"),
                    req.get("relations"),
                )
                self._send(200, out)
            except ServiceOverloaded as e:
                self._send(503, {"error": str(e)})
            except (ValueError, KeyError, TypeError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover
                logger.exception("generate failed")
                self._send(500, {"error": str(e)})

        def log_message(self, fmt, *args):
            logger.info("%s - %s", self.address_string(), fmt % args)

    return Handler


def main(argv=None):
    import argparse

    from layoutdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(
        description="serve: layoutdm_tpu.serve_cli job_dir=<dir> [k=v ...]"
    )
    p.add_argument("overrides", nargs="*")
    a = p.parse_args(argv)
    kv = dict(o.split("=", 1) for o in a.overrides)
    job_dir = kv.get("job_dir")
    assert job_dir, "job_dir=<trained job> is required"
    port = int(kv.get("port", 8700))
    ladder = tuple(
        int(t) for t in kv.get("timestep_ladder", "").split(",") if t
    )
    service = LayoutService(
        job_dir,
        max_batch_size=int(kv.get("max_batch_size", 64)),
        warm_tasks=tuple(kv.get("warm_tasks", "unconditional").split(",")),
        timestep_ladder=ladder,
        max_edges=int(kv.get("max_edges", 32)),
        coalesce_window_ms=float(kv.get("coalesce_window_ms", 2.0)),
        request_timeout_s=float(kv.get("request_timeout_s", 600.0)),
        max_queued_requests=int(kv.get("max_queued_requests", 256)),
    )
    # threaded HTTP front so concurrent requests queue AT the coalescer
    # (where they merge into shared program runs), not in the socket backlog
    server = LayoutHTTPServer(
        (kv.get("host", "127.0.0.1"), port), make_handler(service)
    )
    logger.info("listening on :%d", port)
    server.serve_forever()


if __name__ == "__main__":
    main()
