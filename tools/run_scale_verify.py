#!/usr/bin/env python3
"""Chunked scale-sidecar correctness sweep (sf10/sf100).

At sf100 the full-suite Verify cannot hold all dumps on disk at once
(decode/session outputs are ~100M rows each; wash_pairs ~575M), and one
JVM running every heavy plan back-to-back accumulates heap pressure.
This driver runs the suite in CHUNKS: each chunk is its own forked
Verify JVM (dumps written multi-file, SPARK_GRAFT_COALESCE=0), then
check_oracle.py in GRAFT_HASH_MODE (order-independent engine-side
multiset hash — no pandas materialization), then the chunk's dumps are
DELETED before the next chunk starts. Disk stays bounded by the largest
single chunk; DuckDB never runs concurrently with a live Spark JVM.

Exclusions at sf100 (documented here per VERDICT r8 item 6 — the
inclusion list is everything else in SparkEntry.queries):

- the 8 `_dropall` drop-policy twins (pagerank/taint/kcore/triangles/
  wallet_clusters/neighbor_sim/edge_growth/sandwich): vacuous at
  production density BY DESIGN (the drop filter deletes every over-cap
  bucket — that is what the opt-in means), and their 10-step uncapped
  CTE unrolls are exactly the oracles that exhausted DuckDB's spill
  disk in round 8 while verifying 0-row outputs. The unsuffixed
  (degrade-not-drop, round-9 default) queries verify instead.
- the 7 pair-EXPANDED dedup surfaces (ngram_jaccard, containment,
  embedding, semantic_dedup, minhash_lsh, simhash, hyperplane): their
  outputs/intermediates grow quadratically under K-fold replication
  (sf100 = 1000 copies -> 1e6x the base pair count; hyperplane alone
  is 11.3e9 true pairs). They are hash-green at sf0.01/sf0.1 where the
  expansion is the small-scale oracle; the replication-invariant `_rep`
  contracts carry the same semantics to scale and ARE verified here.
- the 10 expanded doc-pair REPORTS (canonical, best_quality, corpus,
  cluster_sizes, dup_flow, dup_provenance, split_leakage[_lsh],
  effective_tokens[_lsh]): same quadratic-expansion reason (46 GB
  blockmgr spill witnessed in round 8). Every one with a rep-level
  reformulation has a `_rep` twin that IS verified here (incl.
  q_dedup_best_quality_rep, added round 11); dup_provenance's output
  is itself the expanded pair list, so it has no rep form.

sf10 evidence for the same contract (round 9): q_dedup_docs_simhash is
OUTPUT-quadratic under replication (member-pair expansion) and
OOM-killed two full-suite Verify JVMs before being excluded; the
neighbor_sim/triangles `_dropall` ORACLES (10-step uncapped CTE
unrolls) exhausted DuckDB spill at sf10 under BOTH 60 GB mem + 45 GB
free disk and a 90 GB RAM budget — Spark dumped their outputs fine;
the oracle is the infrastructure that cannot follow the drop policy to
density, which is the round-8 verdict's item-6 rationale verbatim.

Usage: run_scale_verify.py <sf_dir> <work_dir> <merged_json> [chunk_csv...]
  With no chunk args, builds the default sf100 chunk plan below.
"""
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR, WORK, MERGED = sys.argv[1], sys.argv[2], sys.argv[3]

EXCLUDE = {
    # drop-policy twins: vacuous at scale by design, oracle unrunnable
    "q_events_pagerank_dropall", "q_events_taint_dropall",
    "q_events_kcore_dropall", "q_events_triangles_dropall",
    "q_events_wallet_clusters_dropall", "q_events_neighbor_sim_dropall",
    "q_events_edge_growth_dropall", "q_events_sandwich_dropall",
    # pair-expanded dedup surfaces: quadratic under replication
    "q_dedup_docs_ngram_jaccard", "q_dedup_docs_containment",
    "q_dedup_docs_embedding", "q_docs_semantic_dedup",
    "q_dedup_docs_minhash_lsh", "q_dedup_docs_simhash",
    "q_dedup_docs_hyperplane",
    # expanded doc-pair reports: rep twins carry these to scale
    # (q_dedup_best_quality consumes the same expanded-pair `lbl`
    # labels as q_dedup_docs_canonical — same quadratic class;
    # q_dedup_best_quality_rep IS verified here)
    "q_dedup_docs_canonical", "q_dedup_docs_corpus",
    "q_dedup_cluster_sizes", "q_docs_dup_flow", "q_docs_dup_provenance",
    "q_docs_split_leakage", "q_docs_split_leakage_lsh",
    "q_docs_effective_tokens", "q_docs_effective_tokens_lsh",
    "q_dedup_best_quality",
    # pair-recall QA gates: their EXACT reference feeds are the
    # pair-expanded lists above (ngram_jaccard / cosine pairs), so the
    # gates inherit the same quadratic-under-replication exclusion; the
    # linear gates (ivf/pq/ivfpq/mmr/hll/percentile) stay included
    "q_qa_minhash_recall", "q_qa_hyperplane_recall", "q_qa_simhash_recall",
}

# Round 11: the former SF100_EXCLUDE set (q_stream_session_native /
# q_stream_session_timeout) is CLOSED — both pipelines now write
# executor-side file sinks (Complete-mode foreachBatch parquet
# overwrite / append-mode native parquet sink) and read the result
# back, so the ~95M-row sf100 session table never touches the driver
# heap. Nothing is sf100-only excluded anymore.
SF100_EXCLUDE = set()

# Heavies run serialized (pool=1) in pairs; big-OUTPUT queries (~events-
# sized dumps, 100M rows / 2-5 GB parquet each at sf100) run in triples
# so at most ~15 GB of dump sits on disk before the post-check delete;
# everything else rides in wide batches.
HEAVY = [
    "q_events_wash_pairs", "q_events_taint", "q_events_pagerank",
    "q_events_absorption", "q_events_stationary_mix",
    "q_docs_decontaminated", "q_docs_repeated_spans", "q_docs_soft_dedup",
    "q_docs_effective_tokens_rep", "q_docs_effective_tokens_rep_lsh",
    "q_docs_split_leakage_rep", "q_docs_split_leakage_rep_lsh",
    "q_dedup_docs_hyperplane_rep", "q_docs_dup_flow_rep",
    "q_dedup_docs_corpus_rep", "q_dedup_cluster_sizes_rep",
    "q_events_cusum", "q_sink_upsert", "q_sink_compact",
    "q_stream_dedup_replay", "q_stream_session_closures",
    "q_stream_session_native", "q_stream_session_timeout",
]

BIG_OUTPUT = [
    "q_events_filter_types", "q_events_trade_price",
    "q_events_decode_roundtrip", "q_events_decode_dispatch",
    "q_events_decode_swap", "q_events_decode_create",
    "q_events_decode_liquidity", "q_events_decode_mixed",
    "q_events_decode_strfield", "q_events_clmm_decode",
    "q_events_clmm_u128", "q_events_cpmm_decode", "q_events_cpi_merge",
    "q_events_instr_decode", "q_events_log_extract",
    "q_events_json_ingest", "q_events_json_props",
    "q_events_pumpfun_create_real", "q_events_launch_decode",
    "q_events_cumulative_user", "q_events_asof_attribution",
    "q_events_asof_merge", "q_events_asof_tolerance",
    "q_events_account_asof", "q_events_range_join",
    "q_events_range_join_auto", "q_events_session_30m",
    "q_events_session_native", "q_events_state_history",
    "q_events_dedup_exact", "q_events_merge_partials",
    "q_events_fifo_match", "q_events_wire_source",
    "q_events_resync", "q_events_wire_resync", "q_events_wire_checksum",
    "q_stream_wire_egress", "q_window_rank_orders", "q_vwap_lineitem",
    # round 11: both produce events-sized outputs (~100M rows at sf100)
    "q_stream_wire_incremental", "q_events_base58_roundtrip",
]


def all_queries():
    import re
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "src/main/scala/graft/SparkEntry.scala")).read()
    names = []
    for m in re.finditer(r'"(q_[a-z0-9_]+)"\s*->', src):
        if m.group(1) not in names:
            names.append(m.group(1))
    return names


def chunks():
    excl = EXCLUDE | (SF100_EXCLUDE if "sf100" in SF_DIR else set())
    qs = [q for q in all_queries() if q not in excl]
    heavies = [q for q in HEAVY if q in qs]
    bigs = [q for q in BIG_OUTPUT if q in qs and q not in set(heavies)]
    rest = [q for q in qs if q not in set(heavies) | set(bigs)]
    out = [heavies[i:i + 2] for i in range(0, len(heavies), 2)]
    out += [bigs[i:i + 3] for i in range(0, len(bigs), 3)]
    B = 40
    out += [rest[i:i + B] for i in range(0, len(rest), B)]
    return out


def run(chunk, idx):
    names = ",".join(chunk)
    out_dir = f"{WORK}/out_{idx}"
    jout = f"{WORK}/res_{idx}.json"
    if os.path.exists(jout):
        print(f"[chunk {idx}] already done, skipping", flush=True)
        return
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=names,
               SPARK_GRAFT_COALESCE="0",
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "16"),
               SPARK_GRAFT_POOL="1" if len(chunk) <= 2 else "2",
               SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "40g"))
    t0 = time.time()
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF_DIR} {out_dir}"],
        env=env, cwd=os.path.join(os.path.dirname(__file__), ".."),
        stdout=open(f"{WORK}/verify_{idx}.log", "w"),
        stderr=subprocess.STDOUT, timeout=7200)
    print(f"[chunk {idx}] verify rc={r.returncode} "
          f"{time.time()-t0:.0f}s: {names[:120]}", flush=True)
    env2 = dict(os.environ, GRAFT_HASH_MODE="1", GRAFT_DUCKDB_FRESH_CON="1",
                GRAFT_DUCKDB_TMP=os.environ.get("GRAFT_DUCKDB_TMP",
                                                "/tmp/ddb_spill"),
                GRAFT_DUCKDB_MEM=os.environ.get("GRAFT_DUCKDB_MEM", "60GB"),
                GRAFT_JSON_OUT=jout)
    os.makedirs(env2["GRAFT_DUCKDB_TMP"], exist_ok=True)
    t1 = time.time()
    r2 = subprocess.run(
        ["python3", os.path.join(os.path.dirname(__file__),
                                 "check_oracle.py"), SF_DIR, out_dir],
        env=env2, stdout=open(f"{WORK}/check_{idx}.log", "w"),
        stderr=subprocess.STDOUT, timeout=7200)
    print(f"[chunk {idx}] check rc={r2.returncode} "
          f"{time.time()-t1:.0f}s", flush=True)
    shutil.rmtree(out_dir, ignore_errors=True)


def main():
    os.makedirs(WORK, exist_ok=True)
    # explicit chunk_csv args scope the run (gap-fill mode); otherwise
    # the full default plan over every non-excluded registered query
    plan = ([a.split(",") for a in sys.argv[4:]] if len(sys.argv) > 4
            else chunks())
    total = sum(len(c) for c in plan)
    print(f"{len(plan)} chunks, {total} queries, sf={SF_DIR}", flush=True)
    for i, c in enumerate(plan):
        run(c, i)
    merged = {}
    for i in range(len(plan)):
        p = f"{WORK}/res_{i}.json"
        if os.path.exists(p):
            merged.update(json.load(open(p)))
    with open(MERGED, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    bad = {k: v for k, v in merged.items()
           if v.get("err") not in (None, "no_oracle")
           or v.get("hash_match") is False}
    print(f"merged {len(merged)} queries -> {MERGED}; "
          f"{sum(1 for v in merged.values() if v.get('hash_match'))} green, "
          f"{sum(1 for v in merged.values() if v.get('err') == 'no_oracle')} "
          f"no_oracle, {len(bad)} bad: {sorted(bad)[:20]}", flush=True)


if __name__ == "__main__":
    main()
