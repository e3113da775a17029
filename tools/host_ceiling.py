"""Host scaling-ceiling calibration — the round-2 kernel, committed.

Measures the MACHINE's own parallel-scaling ceiling with the engine's
exact per-task kernel and zero framework: K independent multiprocessing
workers each run ``build_segment`` on a disjoint 15.6k-doc slice of the
bench corpus (the production task granularity from BASELINE.md's 10M-doc
task-size study). Ray, the object store, and shuffles are absent, so the
ratio docs/s@4N over docs/s@N is the host's memory-bandwidth/contention
ceiling for this workload shape; the engine's paired Ray runs are read
AGAINST this ceiling (BASELINE.md runs C/D: engine captured 91-99% of the
same-minute ceiling).

Usage:  python tools/host_ceiling.py [lo] [hi]       (defaults 4 16)
Prints one JSON line: docs/s at each level, ceiling efficiency, and the
host page-throughput stamps bracketing each level.
"""
import json
import multiprocessing as mp
import os
import shutil
import sys
import time


DOCS_PER_TASK = 15_000  # ~the 15.6k production granularity, CHUNK-aligned


def _one_task(args):
    i, corpus_file, out_dir = args
    from lucene_solr_ray.index.build import build_segment, plan_partitions

    # same metadata-only planner the engine uses; every worker builds
    # the SAME warm slice under a distinct partition id / doc_base
    part = dict(plan_partitions(corpus_file, DOCS_PER_TASK)[0])
    part["partition_id"] = i
    part["doc_base"] = i * part["rows"]
    t0 = time.perf_counter()
    build_segment(part, out_dir, text_field="content",
                  analyzer_name="standard", byte_aligned=True,
                  store_positions=True)
    return time.perf_counter() - t0, part["rows"]


def _stamp():
    import numpy as np

    t0 = time.perf_counter()
    a = np.zeros(1_000_000_000, np.uint8)
    a[::4096] = 1
    return round(1.0 / (time.perf_counter() - t0), 3)


def run_level(nproc: int, corpus_file: str, tasks_per_proc: int = 2):
    out_dir = f"/tmp/lsr_ceiling_{os.getpid()}_{nproc}"
    for sub in ("segments", "norms", "_checkpoints"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    n_tasks = nproc * tasks_per_proc
    args = [(i, corpus_file, out_dir) for i in range(n_tasks)]
    pre = _stamp()
    with mp.get_context("spawn").Pool(nproc) as pool:
        pool.map(_one_task, args[:nproc])  # warm: imports + analyzers
        shutil.rmtree(os.path.join(out_dir, "_checkpoints"),
                      ignore_errors=True)
        os.makedirs(os.path.join(out_dir, "_checkpoints"), exist_ok=True)
        t0 = time.perf_counter()
        results = pool.map(_one_task, args)
        wall = time.perf_counter() - t0
    post = _stamp()
    shutil.rmtree(out_dir, ignore_errors=True)
    times = [r[0] for r in results]
    docs = sum(r[1] for r in results)
    return {
        "nproc": nproc,
        "docs_per_sec": round(docs / wall, 1),
        "mean_task_s": round(sum(times) / len(times), 3),
        "wall_s": round(wall, 2),
        "stamp_pre_gbps": pre,
        "stamp_post_gbps": post,
    }


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from lucene_solr_ray.sources import write_corpus

    corpus = f"/tmp/lsr_ceiling_corpus_{DOCS_PER_TASK}"
    if not os.path.isdir(corpus):
        write_corpus(corpus, DOCS_PER_TASK, docs_per_file=DOCS_PER_TASK)
    corpus_file = os.path.join(corpus, sorted(os.listdir(corpus))[0])
    # every task re-reads the SAME file slice: page-cache-warm input,
    # so the measured contention is compute+allocation, not disk
    with open(corpus_file, "rb") as fh:
        while fh.read(1 << 22):
            pass
    r_lo = run_level(lo, corpus_file)
    r_hi = run_level(hi, corpus_file)
    eff = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / (hi / lo)
    print(json.dumps({
        "metric": f"host ceiling efficiency ({lo} -> {hi} procs, "
                  f"build_segment kernel, no Ray)",
        "ceiling_efficiency": round(eff, 3),
        f"level_{lo}": r_lo,
        f"level_{hi}": r_hi,
        "docs_per_task": DOCS_PER_TASK,
    }))


if __name__ == "__main__":
    main()
