"""Global engine configuration with live reconfiguration.

Mirrors the semantics of the reference's global `Config` of validated atomics
(/root/reference/engine/config/config.hpp:17-89): the same keys are accepted by
`update_config`, and it reports whether running query state must be swapped.

The TPU engine maps the reference's thread/queue knobs onto batching and
kernel parameters:
  - IntraQueryThreads      -> (no direct analogue; kept for API compat)
  - MasterQueueSize        -> beam width cap (search L)
  - LocalQueueSize         -> kept for API compat (beam width shares L)
  - GlobalSyncInterval     -> beam-search iterations between convergence checks
  - NumExecutorPerField    -> max concurrent query batches per field
  - RebuildThreads         -> host threads for index build orchestration
  - PreFilter              -> evaluate filters before the ANN search
"""
from __future__ import annotations

import threading
from typing import Any, Dict, Tuple


class Config:
    def __init__(self):
        self._lock = threading.Lock()
        # Defaults follow reference config.hpp:18-26.
        self.intra_query_threads = 4
        self.master_queue_size = 500
        self.local_queue_size = 500
        self.global_sync_interval = 15
        self.minimal_graph_size = 100
        self.num_executor_per_field = 16
        self.rebuild_threads = 1
        self.pre_filter = False
        # TPU-specific knobs (no reference analogue).
        self.search_ef = 64           # beam width for graph search
        self.query_batch_window_ms = 2.0   # batching window for concurrent queries
        self.use_bf16_matmul = True   # bf16 MXU distance blocks with f32 accumulation
        self.brute_force_threshold = 512   # reference vec_search_executor.hpp:28
        self.rebuild_interval_s = 60.0     # reference db_server.hpp:21
        # Graph build parameters (reference NSG: K=100, out_degree=50,
        # ann_graph_segment.cpp:28-29; here: exact-KNN + alpha occlusion).
        self.graph_knn_k = 64
        self.graph_degree = 32
        self.graph_alpha = 1.2
        self.beam_expand = 4          # beam entries expanded per iteration
        # Stop a query once its best `beam_term_width` entries are all
        # expanded (0 = whole beam). 12 keeps recall@10 >= 0.99 raw
        # (1.0 after exact re-rank) on SIFT-class data (measured sweep).
        self.beam_term_width = 12
        # Traverse only the first N adjacency columns (forward edges +
        # part of the reverse slack). 48 of 64 cut gathered rows 25% with
        # no recall change in the 500k sweep; 0 = full adjacency.
        self.beam_traversal_degree = 48
        # Traversal iteration cap (0 = beam width, the safe default).
        # Iterations are the dominant query cost (each gathers up to
        # BeamCompact rows/query); tune_search_ef tunes a per-field
        # override jointly with SearchEf — measured at 500k x 128,
        # 4 iterations hold recall@10 0.9999 at ~2x the QPS of the
        # full-width default.
        self.beam_iters = 0
        # Candidate compaction: per traversal iteration, gather at most this
        # many candidate rows after dropping padding/in-beam/duplicate/
        # already-visited candidates (0 = gather all expand*degree).
        # Traversal is row-gather-bound, so this caps its dominant cost.
        # 96 of expand*degree=192 measured best at 500k: 16.3k QPS at
        # engine recall 0.9997 vs 13.9k at 128 and 13.9k at 0.
        self.beam_compact = 96
        # Write WAL insert entries as the reference's JSON-text lines
        # instead of binary column batches (slower; for interop).
        self.wal_text_format = False
        # Multi-chip data plane: shard dense columns + graphs row-wise over
        # this many devices (0 = off / single chip). Requires >= 2 devices;
        # tables created after the change pick it up.
        self.shard_count = 0
        # Above this row count, graph builds use IVF-partitioned KNN
        # (ops/ivf.py, sub-quadratic) instead of the exact blocked scan.
        self.ivf_knn_threshold = 3_000_000
        # IVF-KNN probe count; 0 = auto (scales with cluster skew above
        # max_clusters * cluster_rows rows — see ops/ivf.ivf_knn).
        self.ivf_probes = 0
        # Largest query-batch bucket pre-compiled after load/rebuild
        # (table._warmup). 16 = smallest only (library default); the REST
        # server raises it to 2048 at boot so a client flood never stalls
        # behind a big-bucket XLA compile. 0 = no warmup.
        self.warmup_buckets = 16
        # Pool-search stage of the graph build (per-node beam search over
        # the bootstrap KNN graph): beam width and iteration budget. The
        # stage is the build's linear cost (~0.2 ms/row at 128-d).
        # 0 = auto (index.graph resolves a measured size-based policy);
        # explicit values pin both stages.
        self.build_search_l = 0
        self.build_search_iters = 0
        # On-device exact f32 re-rank ("auto" | "on" | "off"): keep an f32
        # copy of graph rows on device and re-score candidates there,
        # removing the host re-rank from the critical path (and making
        # grouped throughput dispatch possible without a host stage
        # between batches). auto = on while the copy fits
        # device_rerank_max_bytes; "off" falls back to host re-rank.
        self.device_rerank = "auto"
        self.device_rerank_max_bytes = 8 << 30
        # Throughput mode: group up to this many query batches into ONE
        # device program (lax.scan), amortizing the per-dispatch fixed
        # cost (~45 ms through a tunneled relay). 1 = off.
        self.query_group_size = 4
        # Grouped-path super-chunks kept in flight (dispatch-ahead depth):
        # chunk i+1's query upload and chunk i-1's result fetch overlap
        # chunk i's kernel. Bounds device-side query/result buffers.
        self.dispatch_ahead = 2
        # Query uploads issued from this many background threads (0 =
        # inline enqueue on the dispatch thread). The tunneled relay
        # SERIALIZES h2d transfers issued from one thread at ~33 ms
        # handshake + bytes per put (benchmarks/put_micro.py: bursting N
        # async puts costs N x 46 ms; a pytree put pays per leaf), but
        # puts issued from separate threads pipeline the handshakes:
        # measured 46 -> 34 ms/MB-put at 2 threads, 28.5 at 4. The
        # super-chunk query upload is the measured wall of the grouped
        # path at 100k (R4i), so overlapping uploads is worth ~25 ms per
        # 2-chunk pass. 4 threads: ~28.5 ms/MB-put vs 34 at 2
        # (put_micro), and the r5 steady-state sweep at 32k queries/pass
        # measured 54.4k vs 47.6k QPS median (benchmarks/
        # steady_state_ab.py).
        self.upload_threads = 4
        # Result drains (the packed-int32 d2h fetch per super-chunk)
        # issued from this many background threads (0 = inline on the
        # dispatch thread). d2h transfers serialize within one issuing
        # thread exactly like puts (~27-30 ms handshake per fetch,
        # benchmarks/fetch_micro.py) and pipeline across threads; the
        # 2-super-chunk bench pass otherwise ends with two back-to-back
        # blocking drains on the dispatch thread.
        self.drain_threads = 2
        # Fused int8 traversal ("off" | "auto" | "on"): inline each node's
        # traversal neighbors' int8-quantized vectors with its adjacency
        # row so one beam iteration gathers [B*expand] fused rows instead
        # of [B*compact] vector rows. DEFAULT AUTO (size-gated). History:
        # round 3 measured a 1.8x end-to-end REGRESSION and defaulted it
        # off — that loss was an artifact of the lax loop machinery
        # (~1.5-1.8 ms of backend overhead PER loop step, iter_micro.py)
        # taxing the fused path's uncompacted width; with tuned-depth
        # traversals now compiled as straight-line code the round-4 A/B
        # flipped: 500k x 128 grouped 57.0k QPS fused vs 51.7k split,
        # 100k 60.5k vs 51.0k, identical tuned params, recall 0.997 both.
        # Exact final ordering is always preserved by the f32 re-rank.
        self.fused_traversal = "auto"
        self.fused_max_bytes = 12 << 30
        # Physical device HBM (bytes) for backends that report no
        # memory_stats (the tunneled axon TPU backend returns None): HBM
        # gates then budget against this total minus the engine's known
        # resident buffers instead of flying blind. Default = TPU v5e
        # (16 GB). 0 = unknown -> only static byte caps apply.
        self.device_hbm_bytes = 16 << 30
        # Auto-tune search parameters after every leader graph build:
        # tune_search_ef walks the (ef, iters) ladder against the target
        # recall on self-queries and persists per-field overrides. Without
        # it a served table runs the static SearchEf default at FULL
        # traversal depth — measured 0.28 s per ~51-query group in the
        # serving bench vs ~15 ms tuned (the reference ships static queue
        # sizes, config.hpp:18-24; an accuracy-targeted auto-tune is the
        # TPU-native replacement).
        self.auto_tune_search = True
        self.auto_tune_target_recall = 0.995
        # Query upload dtype for the grouped throughput path: "f32" |
        # "bf16" | "auto". The h2d query upload sits on the first
        # super-chunk's critical path (~45 MB/s through a tunneled relay;
        # bf16 halves it). Traversal already scores queries in the table
        # dtype and the EUCLIDEAN q-norm term is a per-query constant, so
        # bf16 only perturbs the on-device exact re-rank's near-tie
        # ordering; "auto" applies bf16 ONLY for fields where
        # tune_search_ef measured the recall target still met with it.
        self.query_dtype = "auto"
        # Flat-serve ("auto" | "on" | "off"): serve dense queries from a
        # fused whole-table Pallas scan + on-device exact f32 re-rank
        # instead of graph traversal when the table is at or below
        # FlatServeMaxRows. The reference cuts to brute force below 512
        # rows (vec_search_executor.hpp:28) because CPU scan cost grows
        # linearly; on the MXU one fused bf16 scan of a 100k-row table is
        # cheaper than a tuned beam traversal, so the cutover moves up
        # three orders of magnitude — with near-exact recall and no
        # tuning. "on" ignores the row gate (structural gates — Pallas
        # tiling, survivor width — still apply); "off" never flat-serves.
        self.flat_serve = "auto"
        self.flat_serve_max_rows = 262144
        # Pool-SEARCH stage on/off: "auto" | "on" | "off". Measured
        # (500k x 128 and 500k x 960, 4096 queries vs exact oracle): with
        # query-time representative-cover seeding the KNN-only prune graph
        # matches the pool-search graph's recall and QPS exactly, at ~10x
        # less build time — the NSG navigation-path edges earn nothing
        # when every query seeds from its own top-of-cover entry points.
        # auto = off; "on" restores the pool-search stage for A/B.
        self.build_search_pools = "auto"

    # key -> (attribute, converter, validator-or-None, requires_swap).
    # Declarative so update() can validate EVERY key before applying any:
    # a rejected multi-key payload must leave the config untouched.
    _KEYS = {
        "IntraQueryThreads": ("intra_query_threads", int,
                              lambda v: 1 <= v <= 128, True),
        "ConcurrentWorkersPerVectorIndex": ("num_executor_per_field", int,
                                            lambda v: 1 <= v <= 1024, True),
        "NumExecutorPerField": ("num_executor_per_field", int,
                                lambda v: 1 <= v <= 1024, True),
        "MasterQueueSize": ("master_queue_size", int,
                            lambda v: 1 <= v <= 16000, True),
        "LocalQueueSize": ("local_queue_size", int,
                           lambda v: 1 <= v <= 16000, True),
        "GlobalSyncInterval": ("global_sync_interval", int,
                               lambda v: 1 <= v <= 1000, True),
        "MinimalGraphSize": ("minimal_graph_size", int,
                             lambda v: 1 <= v <= 1_000_000, False),
        "RebuildThreads": ("rebuild_threads", int,
                           lambda v: 1 <= v <= 128, False),
        "PreFilter": ("pre_filter", bool, None, False),
        "SearchEf": ("search_ef", int, lambda v: 1 <= v <= 16000, False),
        "UseBf16Matmul": ("use_bf16_matmul", bool, None, False),
        "BruteForceThreshold": ("brute_force_threshold", int, None, False),
        "RebuildIntervalSeconds": ("rebuild_interval_s", float, None, False),
        "GraphKnnK": ("graph_knn_k", int, lambda v: 4 <= v <= 512, False),
        "GraphDegree": ("graph_degree", int, lambda v: 4 <= v <= 256, False),
        "GraphAlpha": ("graph_alpha", float,
                       lambda v: 1.0 <= v <= 2.0, False),
        "BeamExpand": ("beam_expand", int, lambda v: 1 <= v <= 32, False),
        "WalTextFormat": ("wal_text_format", bool, None, False),
        "BeamIters": ("beam_iters", int, lambda v: 0 <= v <= 16000, False),
        "BeamTermWidth": ("beam_term_width", int,
                          lambda v: 0 <= v <= 16000, False),
        "BeamTraversalDegree": ("beam_traversal_degree", int,
                                lambda v: 0 <= v <= 512, False),
        "BeamCompact": ("beam_compact", int,
                        lambda v: 0 <= v <= 4096, False),
        "ShardCount": ("shard_count", int, lambda v: 0 <= v <= 4096, False),
        "QueryBatchWindowMs": ("query_batch_window_ms", float,
                               lambda v: 0.0 <= v <= 1000.0, False),
        "IvfKnnThreshold": ("ivf_knn_threshold", int,
                            lambda v: 10_000 <= v <= 1_000_000_000, False),
        "IvfProbes": ("ivf_probes", int,
                      lambda v: 0 <= v <= 1024, False),
        "WarmupBuckets": ("warmup_buckets", int,
                          lambda v: 0 <= v <= 4096, False),
        # 0 = auto (index.graph resolves the measured policy).
        "BuildSearchL": ("build_search_l", int,
                         lambda v: v == 0 or 8 <= v <= 1024, False),
        "BuildSearchIters": ("build_search_iters", int,
                             lambda v: v == 0 or 1 <= v <= 256, False),
        "BuildSearchPools": ("build_search_pools", str,
                             lambda v: v in ("auto", "on", "off"), False),
        "DeviceRerank": ("device_rerank", str,
                         lambda v: v in ("auto", "on", "off"), False),
        "DeviceRerankMaxBytes": ("device_rerank_max_bytes", int,
                                 lambda v: 0 <= v <= (1 << 40), False),
        "QueryGroupSize": ("query_group_size", int,
                           lambda v: 1 <= v <= 64, False),
        "DispatchAhead": ("dispatch_ahead", int,
                          lambda v: 1 <= v <= 16, False),
        "UploadThreads": ("upload_threads", int,
                          lambda v: 0 <= v <= 8, False),
        "DrainThreads": ("drain_threads", int,
                         lambda v: 0 <= v <= 8, False),
        "FusedTraversal": ("fused_traversal", str,
                           lambda v: v in ("auto", "on", "off"), False),
        "FusedMaxBytes": ("fused_max_bytes", int,
                          lambda v: 0 <= v <= (1 << 40), False),
        "DeviceHbmBytes": ("device_hbm_bytes", int,
                           lambda v: 0 <= v <= (1 << 44), False),
        "QueryDtype": ("query_dtype", str,
                       lambda v: v in ("auto", "f32", "bf16", "int8"),
                       False),
        "AutoTuneSearch": ("auto_tune_search", bool, None, False),
        "AutoTuneTargetRecall": ("auto_tune_target_recall", float,
                                 lambda v: 0.5 <= v <= 1.0, False),
        "FlatServe": ("flat_serve", str,
                      lambda v: v in ("auto", "on", "off"), False),
        "FlatServeMaxRows": ("flat_serve_max_rows", int,
                             lambda v: 0 <= v <= (1 << 31), False),
    }

    def update(self, cfg: Dict[str, Any]) -> Tuple[bool, bool]:
        """Apply a JSON config update.

        Returns (ok, swap_required) mirroring reference `updateConfig`
        (config.hpp:65-85): swap_required is True when executor-level state
        (queue sizes / thread counts) changed. Transactional: every key is
        validated before any is applied, so a rejected payload leaves the
        config unchanged.
        """
        with self._lock:
            staged = []  # (attr, value, requires_swap)
            for key, raw in cfg.items():
                spec = self._KEYS.get(key)
                if spec is None:
                    continue  # unknown keys ignored, like the reference
                attr, conv, check, needs_swap = spec
                v = conv(raw)
                if check is not None and not check(v):
                    return False, False
                staged.append((attr, v, needs_swap))
            swap = False
            for attr, v, needs_swap in staged:
                if needs_swap and getattr(self, attr) != v:
                    swap = True
                setattr(self, attr, v)
        return True, swap

    def to_dict(self) -> Dict[str, Any]:
        return {
            "IntraQueryThreads": self.intra_query_threads,
            "ConcurrentWorkersPerVectorIndex": self.num_executor_per_field,
            "MasterQueueSize": self.master_queue_size,
            "LocalQueueSize": self.local_queue_size,
            "GlobalSyncInterval": self.global_sync_interval,
            "MinimalGraphSize": self.minimal_graph_size,
            "RebuildThreads": self.rebuild_threads,
            "PreFilter": self.pre_filter,
            "SearchEf": self.search_ef,
            "UseBf16Matmul": self.use_bf16_matmul,
            "BruteForceThreshold": self.brute_force_threshold,
            "RebuildIntervalSeconds": self.rebuild_interval_s,
            "GraphKnnK": self.graph_knn_k,
            "GraphDegree": self.graph_degree,
            "GraphAlpha": self.graph_alpha,
            "BeamExpand": self.beam_expand,
            "WalTextFormat": self.wal_text_format,
            "BeamIters": self.beam_iters,
            "BeamTermWidth": self.beam_term_width,
            "BeamTraversalDegree": self.beam_traversal_degree,
            "BeamCompact": self.beam_compact,
            "ShardCount": self.shard_count,
            "IvfKnnThreshold": self.ivf_knn_threshold,
            "IvfProbes": self.ivf_probes,
            "WarmupBuckets": self.warmup_buckets,
            "QueryBatchWindowMs": self.query_batch_window_ms,
            "BuildSearchL": self.build_search_l,
            "BuildSearchIters": self.build_search_iters,
            "BuildSearchPools": self.build_search_pools,
            "DeviceRerank": self.device_rerank,
            "DeviceRerankMaxBytes": self.device_rerank_max_bytes,
            "QueryGroupSize": self.query_group_size,
            "DispatchAhead": self.dispatch_ahead,
            "UploadThreads": self.upload_threads,
            "DrainThreads": self.drain_threads,
            "FusedTraversal": self.fused_traversal,
            "FusedMaxBytes": self.fused_max_bytes,
            "DeviceHbmBytes": self.device_hbm_bytes,
            "QueryDtype": self.query_dtype,
            "AutoTuneSearch": self.auto_tune_search,
            "AutoTuneTargetRecall": self.auto_tune_target_recall,
            "FlatServe": self.flat_serve,
            "FlatServeMaxRows": self.flat_serve_max_rows,
        }


# Global config instance, like the reference's `globalConfig`.
global_config = Config()
