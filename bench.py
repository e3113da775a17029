"""Benchmark harness — prints ONE JSON line with headline timings.

Headline: the north-star pipeline — build a SPIMI inverted index over the
synthetic source-code corpus (input_hint shape), merge it into the global
index, and serve the BM25 reference query mix. Secondary: representative
Dataset pipelines (facet, dedup-minhash, ANN) over $GRAFT_SF_DIR tables.

    python bench.py              # one run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # fresh 8-CPU and 32-CPU processes,
                                 # reports throughputs + scaling efficiency

The bench corpus (50k docs) is generated deterministically once and cached
in /tmp; index output dirs are fresh per run so timings never hit
checkpoints.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "50000"))
# file size scales with corpus so build partitions are never capped by
# tiny input files (plan_partitions slices within files; small-file
# corpora should be compacted first — sources.loaders.compact_corpus)
DOCS_PER_FILE = max(5000, min(100_000, BENCH_DOCS // 100))
CORPUS_DIR = f"/tmp/lsr_bench_corpus_{BENCH_DOCS}_{DOCS_PER_FILE}"

QUERY_MIX = [
    "return value", "def run", "+parseToken -getList", "hashKey",
    "table scan merge", "+index +term +freq", "flushWrite readBuf",
    "docField scoreNorm", "0x1f", "segment block",
]


def run_bench() -> dict:
    import ray

    # pre-run calibration: the machine BEFORE this process's footprint
    # (the post-run stamp measures it after 8-32 workers' heaps are
    # resident — on a reclaim-throttled hypervisor those differ a lot)
    cal_pre = host_calibration()
    # optional object-store cap: on hypervisor-reclaim-throttled hosts
    # the default (~40% RAM) store allocation itself trips the reclaim
    # (BASELINE.md host-state stamping); the bench workloads need far
    # less, and the cap applies identically to every leg of a pairing
    obj_gb = os.environ.get("GRAFT_OBJ_STORE_GB")
    kw = ({"object_store_memory": int(float(obj_gb) * (1 << 30))}
          if obj_gb else {})
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np

    from lucene_solr_ray.analysis import get_analyzer
    from lucene_solr_ray.index import build_index, merge_index
    from lucene_solr_ray.search import IndexSearcher, parse_query
    from lucene_solr_ray.sources import write_corpus

    timings: dict[str, float] = {}

    # corpus: cached across runs (generation is not part of the headline)
    if not os.path.isdir(CORPUS_DIR):
        write_corpus(CORPUS_DIR, BENCH_DOCS, docs_per_file=DOCS_PER_FILE)
    # warm OS page cache so we measure compute+shuffle, not first-touch IO
    for f in os.listdir(CORPUS_DIR):
        with open(os.path.join(CORPUS_DIR, f), "rb") as fh:
            while fh.read(1 << 22):
                pass
    # prewarm Ray worker processes (imports) — measures the steady-state
    # cluster a long-running job sees, not one-shot process spin-up
    import ray.data as rd

    def _warm(b):
        import pandas  # noqa: F401

        from lucene_solr_ray.analysis import get_analyzer as g

        g("standard")
        return b

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm, batch_size=1
    ).materialize()

    # fault in object-store + worker-heap pages at data scale: on a
    # hypervisor-lazy host (see host_calibration) first-touch page
    # allocation runs at <1 GB/s and would otherwise be billed to the
    # timed build — an untimed mini build+merge over ONE corpus file
    # absorbs it (a long-running cluster is always warm; this measures
    # the steady state, like the worker prewarm above)
    warm_dir = f"/tmp/lsr_bench_warm_{os.getpid()}"
    shutil.rmtree(warm_dir, ignore_errors=True)
    first_file = os.path.join(CORPUS_DIR, sorted(os.listdir(CORPUS_DIR))[0])
    build_index([first_file], warm_dir,
                rows_per_partition=max(500, DOCS_PER_FILE // NUM_CPUS))
    merge_index(warm_dir)
    shutil.rmtree(warm_dir, ignore_errors=True)

    idx_dir = f"/tmp/lsr_bench_idx_{os.getpid()}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    # enough waves for 32 CPUs, amortized per-task cost — but capped at
    # 25k docs/task: the invert's working set (unique over ~2M tokens)
    # falls out of cache above that (10M point: 100k-doc tasks built at
    # 25.7k docs/s vs 49k at 5k docs; merge prefers the bigger tasks, so
    # 25k is the measured sweet spot for both)
    rpp = max(1000, min(BENCH_DOCS // 64, 25_000))
    t0 = time.perf_counter()
    man = build_index(CORPUS_DIR, idx_dir, rows_per_partition=rpp)
    t1 = time.perf_counter()
    timings["index_build"] = t1 - t0
    merge_index(idx_dir, hot_df_threshold=20_000, salt_group_size=8)
    t2 = time.perf_counter()
    timings["segment_merge"] = t2 - t1

    big = BENCH_DOCS > 2_000_000
    s = IndexSearcher(idx_dir)
    ana = get_analyzer("standard")
    qs = [parse_query(q, ana) for q in QUERY_MIX]
    # at 10M+ docs the exhaustive path scores multi-million-df hot ORs
    # (~10 s/query); block-max pruning is rank-identical, so big runs
    # measure the pruned path only (the deployment path at that scale)
    for q in qs:
        s.search(q, k=10, prune=big)  # warm postings cache
    lat = []
    for _ in range(5):
        s._result_cache.clear()  # measure scoring, not result-cache hits
        for q in qs:
            tq0 = time.perf_counter()
            s.search(q, k=10, prune=big)
            lat.append(time.perf_counter() - tq0)
    timings["query_p50"] = float(np.percentile(lat, 50))
    timings["query_p99"] = float(np.percentile(lat, 99))
    # block-max pruned path (cold decode per query — fresh searcher)
    s2 = IndexSearcher(idx_dir)
    lat2 = []
    for q in qs:
        tq0 = time.perf_counter()
        s2.search(q, k=10, prune=True)
        lat2.append(time.perf_counter() - tq0)
    timings["query_p50_pruned_cold"] = float(np.percentile(lat2, 50))
    t3 = time.perf_counter()
    timings["query_mix"] = t3 - t2

    # steady-state serving throughput: a PERSISTENT SearcherActor pool
    # (replica startup is deployment cost, not per-query cost); one warmup
    # pass, then the measured workload
    from lucene_solr_ray.search.distributed import ServingPool

    many = [f"{a} {b}" for a in ("return", "def", "hashKey", "getMap")
            for b in ("value", "scan", "merge", "block", "token")]
    # sized so the measured workload runs >=0.1 s now that the actor
    # path is parse-cached (~80k qps pooled on the 50k-doc index)
    reps = 500 if BENCH_DOCS <= 200_000 else (2 if big else 10)
    # big indexes: compact front-coded term dict (9.2 B/term) and fewer
    # replicas — 8 full python-str dicts at 10M+ docs OOM a 128 GB host
    # block-max pruning is rank-identical; at 10M docs the exhaustive
    # path scores multi-million-df ORs per query (4 s p99), pruned ~ms
    pool = ServingPool(idx_dir, k=10, prune=big,
                       num_actors=4 if big else min(8, NUM_CPUS),
                       compact_terms=big)
    # warm: many*8 chunks so EVERY actor parses the full query mix
    # (array_split hands each actor one contiguous copy) and the
    # big-batch dispatch path is exercised once before timing
    pool.search_many(many * 8)
    tq0 = time.perf_counter()
    pool.search_many(many * reps)
    timings["serve_qps"] = len(many) * reps / (time.perf_counter() - tq0)

    # secondary pipelines over the driver tables
    from lucene_solr_ray.pipelines.curation import run_curation
    from lucene_solr_ray.pipelines.registry import (
        q_ann_cosine_top5,
        q_asof_join,
        q_chunk_windows,
        q_decontam,
        q_drill_sideways,
        q_facet_lang,
        q_gopher_quality,
        q_line_dedup,
        q_json_facet_nested,
        q_lm_perplexity,
        q_minhash_candidates,
        q_mixture_sample,
        q_pii_redact,
        q_quality_tokens,
        q_semdedup,
        q_tdigest_quantiles,
    )

    secondary = [] if os.environ.get("GRAFT_SKIP_SECONDARY") else [
        ("facet_lang", q_facet_lang),
        ("quality_tokens", q_quality_tokens),
        ("minhash_candidates", q_minhash_candidates),
        ("ann_cosine_top5", q_ann_cosine_top5),
        ("json_facet_nested", q_json_facet_nested),
        ("tdigest_quantiles", q_tdigest_quantiles),
        ("pii_redact", q_pii_redact),
        ("decontam", q_decontam),
        ("chunk_windows", q_chunk_windows),
        ("mixture_sample", q_mixture_sample),
        ("gopher_quality", q_gopher_quality),
        ("lm_perplexity", q_lm_perplexity),
        ("semdedup", q_semdedup),
        ("asof_join", q_asof_join),
        ("drill_sideways", q_drill_sideways),
        ("line_dedup", q_line_dedup),
        ("curation_funnel", run_curation),
    ]
    for name, fn in secondary:
        tq0 = time.perf_counter()
        fn(SF_DIR)
        timings[name] = time.perf_counter() - tq0

    if not os.environ.get("GRAFT_SKIP_SECONDARY"):
        # auto-prefix sidecar (codecs/autoprefix): build cost + the
        # measured win on a wide prefix query, fast path vs expansion
        from lucene_solr_ray.index import build_autoprefix
        from lucene_solr_ray.search import IndexSearcher, PrefixQuery

        tq0 = time.perf_counter()
        build_autoprefix(idx_dir, min_terms=25, max_len=3,
                         concurrency=min(8, NUM_CPUS))
        timings["autoprefix_build"] = time.perf_counter() - tq0
        fast = IndexSearcher(idx_dir)
        slow = IndexSearcher(idx_dir)
        slow._autoprefix_reader = None
        wide = PrefixQuery("get")
        fast._score(wide), slow._score(wide)  # warm both paths once
        tq0 = time.perf_counter()
        fast._score(wide)
        timings["prefix_sidecar_ms"] = 1e3 * (time.perf_counter() - tq0)
        tq0 = time.perf_counter()
        slow._score(wide)
        timings["prefix_expand_ms"] = 1e3 * (time.perf_counter() - tq0)

    shutil.rmtree(idx_dir, ignore_errors=True)
    docs_per_sec = man.max_doc / timings["index_build"]
    corpus_bytes = sum(
        os.path.getsize(os.path.join(CORPUS_DIR, f))
        for f in os.listdir(CORPUS_DIR)
    )
    gb_per_sec = corpus_bytes / 1e9 / timings["index_build"]
    headline = (
        timings["index_build"] + timings["segment_merge"]
        + timings["query_mix"]
    )
    result = {
        "metric": "fulltext index build + merge + BM25 query mix (sec)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_docs": man.max_doc,
        "index_docs_per_sec": round(docs_per_sec, 1),
        "index_gb_per_sec": round(gb_per_sec, 4),
        "host_calibration_pre": cal_pre,
        "host_calibration": host_calibration(),
    }
    ray.shutdown()
    return result


def host_calibration() -> dict:
    """Stamp the machine's state into the bench artifact: engine numbers
    are only interpretable against the host's same-minute capability.
    ``fresh_page_gbps`` is the hypervisor first-touch page-allocation
    bandwidth (lazy host backing makes this 0.03-1.5 GB/s on a cold or
    oversubscribed VM vs >5 warm — it bounds every allocation-heavy
    stage); ``sort20m_warm_s`` is pure in-cache CPU+memory throughput."""
    import numpy as np

    t0 = time.perf_counter()
    a = np.zeros(1_000_000_000, np.uint8)
    a[::4096] = 1
    fresh = 1.0 / (time.perf_counter() - t0)
    del a
    x = np.random.default_rng(0).integers(0, 1 << 40, 20_000_000)
    np.sort(x.copy())  # fault the working set in
    t0 = time.perf_counter()
    np.sort(x.copy())
    warm_sort = time.perf_counter() - t0
    return {"fresh_page_gbps": round(fresh, 3),
            "sort20m_warm_s": round(warm_sort, 3)}


def run_scaling() -> None:
    def run(ncpu: int) -> dict:
        # scaling needs enough per-task work that fixed costs don't
        # dominate: default the paired runs to the 1M-doc corpus
        # (15.6k-doc partitions ~ the per-task size real segment builds
        # use) unless the caller pinned a size
        # the scaling criterion is the BUILD pipeline (north_rule);
        # the sf0.1 secondary queries carry fixed driver-side costs that
        # only add noise to the paired measurement
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SKIP_SECONDARY="1")
        env.setdefault("GRAFT_BENCH_DOCS", "1000000")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    # paired legs: this host's hypervisor page backing oscillates
    # between ~0.02 and ~2.5 GB/s on a minutes timescale (BASELINE.md
    # host-state stamping). Each repetition runs lo and hi BACK-TO-BACK
    # (the same host window), efficiency is computed per pairing, and
    # the headline is the pairing whose two calibration stamps are
    # CLOSEST — never a min-over-reps per side, which can combine legs
    # from different throttle windows and bias the ratio either way.
    # Every pairing's numbers stay in the artifact.
    reps = int(os.environ.get("GRAFT_SCALE_REPEAT", "1"))

    def cal_gap(r_lo: dict, r_hi: dict) -> float:
        c_lo = (r_lo.get("host_calibration") or {}).get(
            "fresh_page_gbps", 0.0)
        c_hi = (r_hi.get("host_calibration") or {}).get(
            "fresh_page_gbps", 0.0)
        m = max(c_lo, c_hi, 1e-9)
        return abs(c_lo - c_hi) / m

    # Leg order within a pairing. Every stamped probe this round shows
    # the host window collapsing AFTER the 32-worker allocation burst
    # (warm-8/cold-32 signature, BASELINE.md) — running the hi leg
    # FIRST lets it use the warm window the gate waited for; a then-
    # degraded lo leg only widens the pairing gap (both stamps are in
    # the artifact, and the gap-closest pairing is still the headline).
    hi_first = os.environ.get("GRAFT_SCALE_ORDER", "lo_first") == "hi_first"
    warm_gate = float(os.environ.get("GRAFT_SCALE_MIN_GBPS", "0"))
    warm_wait = float(os.environ.get("GRAFT_SCALE_WARM_WAIT", "150"))

    pairs = []
    for _ in range(reps):
        if warm_gate > 0:
            _wait_for_warm_host(warm_gate, warm_wait)
        if hi_first:
            r_hi, r_lo = run(hi), run(lo)
        else:
            r_lo, r_hi = run(lo), run(hi)  # back-to-back = one window
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        b_eff = (r_lo["queries"]["index_build"]
                 / r_hi["queries"]["index_build"]) / (hi / lo)
        pairs.append({"r_lo": r_lo, "r_hi": r_hi, "eff": eff,
                      "build_eff": b_eff, "gap": cal_gap(r_lo, r_hi)})

    best = min(pairs, key=lambda p: p["gap"])
    effs = sorted(p["eff"] for p in pairs)
    median_eff = effs[len(effs) // 2] if len(effs) % 2 else \
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
    r_lo, r_hi = best["r_lo"], best["r_hi"]
    print(json.dumps({
        "metric": f"scaling efficiency ({lo} -> {hi} CPUs)",
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"docs_per_sec_{lo}": r_lo["index_docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["index_docs_per_sec"],
        "scaling_efficiency": round(best["eff"], 3),
        "build_scaling_efficiency": round(best["build_eff"], 3),
        "median_scaling_efficiency": round(median_eff, 3),
        "pairing_calibration_gap": round(best["gap"], 3),
        f"queries_{lo}": r_lo["queries"],
        f"queries_{hi}": r_hi["queries"],
        f"host_calibration_{lo}": r_lo.get("host_calibration"),
        f"host_calibration_{hi}": r_hi.get("host_calibration"),
        "legs_per_side": reps,
        "leg_order": "hi_first" if hi_first else "lo_first",
        "all_pairings": [
            {"eff": round(p["eff"], 3),
             "build_eff": round(p["build_eff"], 3),
             "gap": round(p["gap"], 3),
             f"cal_{lo}": p["r_lo"].get("host_calibration"),
             f"cal_{hi}": p["r_hi"].get("host_calibration")}
            for p in pairs],
    }))


def _stamp_floor(res: dict) -> float:
    """Min of the pre/post hypervisor page-throughput stamps — the
    host-window quality of a run (BASELINE.md: this VM oscillates
    0.02-2.5 GB/s and the engine's wall-times track it 2-6x)."""
    vals = []
    for k in ("host_calibration_pre", "host_calibration"):
        v = (res.get(k) or {}).get("fresh_page_gbps")
        if v is not None:
            vals.append(float(v))
    return min(vals) if vals else 0.0


def _wait_for_warm_host(min_gbps: float, max_wait_s: float) -> float:
    """Cheap pre-run gate: probe the hypervisor page-throughput stamp
    every 15 s until it clears ``min_gbps`` or the wait budget runs
    out (windows last minutes — r4 burned all three EXPENSIVE bench
    attempts 5 s apart inside one cold window). Returns the last
    stamp."""
    t0 = time.time()
    g = host_calibration()["fresh_page_gbps"]
    while g < min_gbps and time.time() - t0 < max_wait_s:
        time.sleep(15)
        g = host_calibration()["fresh_page_gbps"]
    return g


def run_bench_warm_window(min_gbps: float = 2.0, attempts: int = 3) -> dict:
    """Retry until a run lands inside a warm host window (both stamps
    >= ``min_gbps``), else report the best-stamped attempt. Each
    attempt first waits (cheap stamping loop, no Ray) for the window
    to open. Keeps the per-round artifact comparable across rounds on
    a host whose capability swings independently of the code under
    test. Override with GRAFT_BENCH_MIN_GBPS / GRAFT_BENCH_ATTEMPTS /
    GRAFT_BENCH_WARM_WAIT; attempts=1 + wait 0 restores the
    single-shot behavior."""
    min_gbps = float(os.environ.get("GRAFT_BENCH_MIN_GBPS", min_gbps))
    attempts = int(os.environ.get("GRAFT_BENCH_ATTEMPTS", attempts))
    max_wait = float(os.environ.get("GRAFT_BENCH_WARM_WAIT", 150.0))
    best = None
    for i in range(max(attempts, 1)):
        _wait_for_warm_host(min_gbps, max_wait)
        res = run_bench()
        res["warm_window_attempt"] = i + 1
        res["warm_window_floor_gbps"] = round(_stamp_floor(res), 3)
        if best is None or _stamp_floor(res) > _stamp_floor(best):
            best = res
        if _stamp_floor(res) >= min_gbps:
            break
    best["warm_window"] = _stamp_floor(best) >= min_gbps
    return best


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench_warm_window()))
