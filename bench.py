"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

The line is kept COMPACT (~1.5 kB < the 2,000-char stdout tail the
driver stores) since r15; the per-query median/exec dicts and the
full cdc/canary blocks go to a sidecar JSON
($SPARK_GRAFT_BENCH_DETAIL, default
/tmp/galaxy_spark_bench_detail.json). "queries" values and all
timers are unchanged from rounds 4-14 (best-of-3 build+exec).

Results are materialized with the noop sink so timings measure full
distributed compute without driver-side collect overhead.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

BENCH_QUERIES = [
    "cdc_change_summary",
    "cdc_projection_update",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_revenue_by_nation",
    "window_topk_customers_per_nation",
    "window_running_revenue",
    "events_sessionization",
    "events_json_extract",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "similarity_cosine_topk",
    "text_stats_documents",
    "join_asof_latest_order",
    "multimodal_image_features",
    "similarity_cosine_topk_gemm",
    "text_tfidf_top_term",
    # r4 widening (VERDICT r3 #2): the honest 8x8 LSH tiers, the
    # remaining dedup tier, the composed pipeline, and the DDL chain
    # were invisible to the bench before
    "similarity_lsh_topk",
    "dedup_embedding_cosine_lsh",
    "dedup_simhash",
    "pipeline_llm_preprocess",
    "cdc_ddl_evolution",
    # r4 curation surface: the iterative, corpus-global, and
    # global-ordering members (the scan-local rest ride the same
    # plan shapes as text_stats)
    "dedup_cluster_canonical",
    "quality_unigram_logprob",
    "shuffle_global_deterministic",
    "embeddings_kmeans_clusters",
    "dedup_semantic_clusters",
    "pipeline_curation_end2end",
    # r5 hygiene surface: the two with non-trivial distributed
    # shapes (broadcast-gram decontamination; gram-keyed span agg).
    # pii_redact / mixture_temperature are scan-local like
    # text_stats and ride the full-surface artifact.
    "decontaminate_ngram_overlap",
    "dedup_ngram_spans",
    # r5 breadth: the new distributed shapes (TPC-H 6-table join +
    # window-folded correlation; PQ ANN; Bloom gate; iterative
    # PageRank; SCD2 window; BM25; bigram LM). The remaining r5
    # additions are scan-local or ride identical plan shapes and
    # stay on the full-surface artifact.
    "q5_local_supplier_volume",
    "q21_latest_shipper_waiting",
    "similarity_pq_topk",
    "dedup_bloom_reference",
    "graph_pagerank_parts",
    "cdc_scd2_history",
    "text_bm25_search",
    "quality_bigram_logprob",
    # r6 breadth: the two new heavy distributed shapes (two-join
    # triangle closure on the 1.2M-edge co-purchase graph; the
    # 3-round iterative BPE merge loop). The CMS sketch and the
    # quantile-bound rows are single-agg shapes that ride the
    # full-surface artifact.
    "graph_triangle_count",
    "text_bpe_merge_steps",
    # r7 breadth: the two new mergeable-sketch shapes (HLL
    # register build + certification; fixed-bin histogram quantile
    # with exact-order-statistic instrument). The remaining r7
    # additions (per-table projection, binlog type tiers) are
    # streaming/connector surface benched by their tests and the
    # full artifact.
    "agg_hll_cardinality_bound",
    "agg_histogram_quantile_value_bound",
    # r8 breadth: the exact substring-span shape (per-char window
    # hashes -> duplicate count -> island merge) is the round's one
    # new heavy distributed plan; text_bpe_encode rides the
    # merge_steps plan + a vocab join and stays on the full artifact.
    "dedup_substring_spans",
]

#: tiny scale used to warm JVM/codegen paths before timing
WARMUP_SF_DIR = "/root/testdata/sf0.001"


def _host_canary() -> dict[str, float]:
    """Fixed pure-CPU micro-workloads timed before any Spark work.

    The sandbox host's effective speed varies run to run (shared-VM
    variance measured at 1.4-3x within one session, r5); these
    canaries let a reader NORMALIZE cross-round query times: if the
    canary moved, the host moved, not the engine. py_loop is
    single-core interpreter speed; np_gemm is the BLAS path the
    Arrow/pandas operators ride."""
    import numpy as np

    def loop():
        t0 = time.perf_counter()
        acc = 0
        for i in range(5_000_000):
            acc += i & 7
        return time.perf_counter() - t0

    def gemm():
        a = np.ones((1500, 1500), dtype=np.float64)
        t0 = time.perf_counter()
        for _ in range(3):
            a = a @ a * 1e-9
        return time.perf_counter() - t0

    loop(), gemm()                      # warm interpreter + BLAS pool
    py_loop = min(loop() for _ in range(3))
    np_gemm = min(gemm() for _ in range(3))
    return {"py_loop": round(py_loop, 3), "np_gemm": round(np_gemm, 3)}


#: CDC throughput workload shape: segments x transactions x rows =
#: 1.28M row-changes. 16 segments give the source 16-way partition
#: parallelism (decode is sequential WITHIN a segment — TABLE_MAP
#: state — and parallel across them, the same unit Kafka partitions
#: give). Volume sizing: at 20k events the wall is ~95% fixed
#: stream-startup/micro-batch overhead (measured 12.4 s for 20k vs
#: 13.5 s for 320k); 1.28M makes steady-state decode+publish the
#: dominant term, which is the regime a long-running connector
#: actually lives in.
_CDC_SEGMENTS, _CDC_TXNS, _CDC_ROWS = 16, 25, 3200


def _gen_cdc_segments(out_dir: str) -> int:
    """Write a deterministic multi-segment binlog stream with the
    independent wire encoder (CRC32-checksummed, GTID+BEGIN+
    TABLE_MAP+rows+XID per transaction — the realistic event mix).
    Returns the number of row-changes written."""
    from tests.fixtures.binlog_wire_encoder import (LONG, VARCHAR,
                                                    BinlogWriter)

    os.makedirs(out_dir, exist_ok=True)
    cols = [(LONG, 0), (LONG, 0), (VARCHAR, 32), (VARCHAR, 64)]
    sid = "ab" * 16
    n = 0
    for seg in range(1, _CDC_SEGMENTS + 1):
        w = BinlogWriter(base_ts=1_710_000_000 + seg)
        w.format_description()
        for t in range(_CDC_TXNS):
            gno = (seg - 1) * _CDC_TXNS + t + 1
            w.gtid(sid, gno)
            w.query("shop", "BEGIN")
            w.table_map(7, "shop", "orders", cols)
            w.write_rows(7, cols, [
                [gno * 1000 + r, r, f"{r}.{r % 100:02d}",
                 f"order-{gno}-{r}"]
                for r in range(_CDC_ROWS)])
            w.xid(gno)
        with open(os.path.join(out_dir, f"binlog.{seg:06d}.bin"),
                  "wb") as f:
            f.write(w.bytes())
        n += _CDC_TXNS * _CDC_ROWS
    return n


def _cdc_throughput(spark) -> dict:
    """The reference's ONE performance claim is its headline —
    'High performance MySQL CDC' (README.md:2) — so ground it with
    a measured number: the full reference-shape chain (binlog BYTES
    -> galaxy_binlog source -> db filter -> projections -> keyed
    topic sink with DLQ) over a generated multi-segment stream,
    reported as row-changes/second wall. Broker-less topic_files
    stands in for Kafka (same keyed-publish semantics, disk-backed);
    the number is end-to-end INCLUDING sink I/O and checkpointing,
    not a decode micro-benchmark."""
    import shutil
    import tempfile
    from types import SimpleNamespace

    from galaxy_spark.cdc.filters import TaskFilter
    from galaxy_spark.sinks_topic import TopicFilesDataSource
    from galaxy_spark.sources.binlog_source import binlog_envelope_factory
    from galaxy_spark.streaming.pipeline import SinkConfig, start_pipeline

    try:
        spark.dataSource.register(TopicFilesDataSource)
    except Exception:
        pass
    root = tempfile.mkdtemp(prefix="cdc_bench_")
    try:
        seg_dir = os.path.join(root, "binlogs")
        n_events = _gen_cdc_segments(seg_dir)
        env = binlog_envelope_factory(seg_dir)(
            spark, SimpleNamespace(checkpoint_epoch=0))
        t0 = time.perf_counter()
        q = start_pipeline(
            env, "bench", TaskFilter(databases=("shop",)),
            ["id", "qty", "amount", "note"],
            SinkConfig("topic_files",
                       {"path": os.path.join(root, "topics")}),
            os.path.join(root, "ck"))
        q.processAllAvailable()
        q.stop()
        wall = time.perf_counter() - t0
        return {"events": n_events, "wall_sec": round(wall, 3),
                "events_per_sec": round(n_events / wall, 1)}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    canary = _host_canary()

    from galaxy_spark.registry import all_queries
    from galaxy_spark.session import get_spark

    # CDC throughput FIRST, on a fresh JVM (r9, r8 verdict wrong #2):
    # running it after the query marathon measured a worn JVM —
    # the committed full-artifact number (66.6k/s) sat 15-35% under
    # the clean-host figure (77.8k/s cold, SCALE.md). A dedicated
    # session before any query work matches the standalone-run
    # discipline; its own canary sample sits beside it so the number
    # can be host-normalized like every other row.
    spark = get_spark("galaxy_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    cdc = _cdc_throughput(spark)
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i & 7
    cdc["canary_py_loop"] = round(time.perf_counter() - t0, 3)
    spark.stop()

    queries = all_queries()

    # SPARK_GRAFT_BENCH_ALL=1: time EVERY registered query (one-off
    # full-surface artifact, VERDICT r4 #7) instead of the tracked
    # 28-query headline set. Headline names keep their order so the
    # comparable subtotals stay comparable; the rest append in
    # registry order.
    bench_names = list(BENCH_QUERIES)
    if os.environ.get("SPARK_GRAFT_BENCH_ALL"):
        bench_names += [n for n in queries if n not in BENCH_QUERIES]

    # Single-JVM marathon degradation (r5 finding): timing 90+
    # queries through one driver JVM inflates LATER queries 1.5-3x
    # (accumulated codegen classes / broadcast cleanup backlog / GC
    # pressure) — re-timed in a fresh JVM, the same queries match
    # their old numbers. So the full-surface run restarts the
    # session every CHUNK queries; each chunk re-warms at sf0.001
    # before its timed loop. The 30-query headline run fits one
    # chunk, so its behavior (and trend comparability) is unchanged.
    chunk_size = 30
    chunks = [bench_names[i:i + chunk_size]
              for i in range(0, len(bench_names), chunk_size)]

    # 3 timed runs per query. Each run times CONSTRUCTION + WRITE:
    # iterative operators (connected components' per-round
    # checkpoints; under AQE even lazy checkpoints execute their
    # shuffle stages while the plan is being built) do real cluster
    # work before the first action, and a write-only timer hides it
    # (r4 finding: the CC query "ran" in 0.08s write-only vs ~1s
    # true cost). "queries" carries the per-query BEST build+exec
    # (steady-state through single-JVM GC/scheduling noise);
    # "queries_median" the MEDIAN, so a regression can be told from
    # one noisy run — best moves but median doesn't => noise; both
    # move => real (VERDICT r3: the unexplained 3x on
    # dedup_minhash_lsh was unadjudicable from a bare best-of-3).
    # "queries_exec" carries the write-only BEST — the number
    # comparable with BENCH_r01-r03, which timed only the write.
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    exec_only: dict[str, float] = {}
    chunk_canaries: list = []
    for chunk in chunks:
        # per-CHUNK canary (r7): the single pre-run canary cannot
        # see a load spike that hits one chunk mid-marathon (the
        # r7 artifact's 5x resize-pipeline outlier was exactly
        # that); a py_loop sample per chunk gives every query a
        # local host-speed denominator for adjudication.
        t0 = time.perf_counter()
        acc = 0
        for i in range(5_000_000):
            acc += i & 7
        chunk_canaries.append(round(time.perf_counter() - t0, 3))
        spark = get_spark("galaxy_spark-bench")
        spark.sparkContext.setLogLevel("ERROR")
        # untimed warmup at sf0.001: JIT/codegen/classloading all
        # happen here so the timed loop measures steady-state
        # execution, which is what a long-running cluster sees
        for name in chunk:
            if name in queries and os.path.isdir(WARMUP_SF_DIR):
                queries[name](spark, WARMUP_SF_DIR) \
                    .write.format("noop").mode("overwrite").save()
        for name in chunk:
            if name not in queries:
                continue
            runs, execs = [], []
            for _ in range(3):
                t0 = time.perf_counter()
                df = queries[name](spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                runs.append(t2 - t0)
                execs.append(t2 - t1)
            runs.sort()
            execs.sort()
            timings[name] = round(runs[0], 3)
            medians[name] = round(runs[len(runs) // 2], 3)
            exec_only[name] = round(execs[0], 3)
            # drop DataFrame refs so ContextCleaner can release the
            # iterative operators' localCheckpoint blocks between
            # queries instead of mid-measurement
            del df
            gc.collect()
        if len(chunks) > 1:
            # fresh JVM-side context per chunk (same gateway);
            # stop() clears the active-context singleton so the next
            # get_spark launches clean
            spark.stop()

    total = round(sum(timings.values()), 3)

    # the first 17 names are the r1-r3 bench set; their WRITE-ONLY
    # subtotal is the number comparable against BENCH_r02/BENCH_r03
    # "value" (same timer, same denominator)
    r3_subset = BENCH_QUERIES[:17]
    full = {
        "metric": "galaxy_spark headline query wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "queries_exec": exec_only,
        "total_median": round(sum(medians.values()), 3),
        "r3_comparable_total": round(
            sum(exec_only[n] for n in r3_subset if n in exec_only), 3),
        "cdc_throughput": cdc,
        "host_canary": canary,
        "chunk_canaries": chunk_canaries,
        "sf": sf,
    }
    if os.environ.get("SPARK_GRAFT_BENCH_ALL"):
        # full-surface artifact mode: one line with every dict, as
        # in rounds 6-14 (this path is never the driver's stored
        # artifact; its consumers read the saved file whole)
        print(json.dumps(full))
    else:
        # Headline (driver) mode prints ONE COMPACT line (~1.5 kB):
        # the r13/r14 artifacts proved the stored stdout tail is
        # 2,000 chars, and the old ~2.9 kB line truncated mid-dict,
        # so round-over-round PERF comparison lost its parse
        # (BENCH_r13 parsed: null -> PERF_r14 n_common: 0). The
        # "queries" dict keeps the SAME values and semantics
        # (best-of-3 build+exec) as every earlier round — only the
        # bulky queries_median / queries_exec dicts leave stdout
        # for the sidecar below; total_median and the exec-based
        # r3_comparable_total stay as scalars, the timers are
        # untouched.
        detail_path = os.environ.get(
            "SPARK_GRAFT_BENCH_DETAIL",
            "/tmp/galaxy_spark_bench_detail.json")
        try:
            with open(detail_path, "w") as fh:
                json.dump(full, fh)
        except OSError:
            pass
        print(json.dumps({
            "metric": full["metric"],
            "value": total,
            "unit": "sec",
            "queries": timings,
            "total_median": full["total_median"],
            "r3_comparable_total": full["r3_comparable_total"],
            "cdc_eps": cdc["events_per_sec"],
            "canary": [canary["py_loop"], canary["np_gemm"],
                       *chunk_canaries],
            "sf": sf,
        }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
