"""Deterministic synthetic source-code corpus (the BASELINE input_hint table).

Generates a Parquet table ``(repo, path, commit, lang, content)`` — the exact
input shape from BASELINE.json — with the content mix FIXTURES.md §1 calls
for: Zipf-distributed identifier vocabulary, camelCase/snake_case, numbers
(``3.14``, ``0x1F``), string literals, English comment lines carrying the 33
Lucene stop words, occasional unicode (CJK comments, accents), rare wide
"vendored blob" rows, exact-duplicate rows, and empty rows.

Determinism contract: content depends only on ``(seed, global doc index)``
via fixed-size generation chunks (CHUNK docs each, RNG seeded per chunk), so
any parallel generation plan produces byte-identical corpora — the property
retries/resume rely on (SURVEY.md §4 "deterministic partition builds").

Scale knob is just ``num_docs``; the corpus generator is itself a Ray Data
pipeline (``write_corpus``) for big scales, or a local pyarrow table
(``generate_table``) for tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

CHUNK = 1000  # docs per deterministic RNG chunk

LANGS = ["python", "java", "c", "go", "js", "md", "txt"]
LANG_W = np.array([0.25, 0.2, 0.15, 0.12, 0.13, 0.08, 0.07])
EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "js": "js",
       "md": "md", "txt": "txt"}

_SYL = ["get", "set", "run", "map", "list", "node", "item", "index", "value",
        "count", "hash", "key", "data", "buf", "read", "write", "parse",
        "token", "term", "doc", "field", "score", "query", "merge", "flush",
        "block", "batch", "shard", "seg", "pos", "freq", "norm", "util",
        "ctx", "tmp", "obj", "ptr", "str", "num", "vec", "arr", "cfg"]

_COMMENT_WORDS = ("the quick brown fox jumps over a lazy dog and if it was "
                  "to be then there will not such that this these on or by "
                  "for with they their into are as at an is no of but").split()

_CJK = "据处理引擎索引查询分词器构建合并排序压缩评分文档词项频率"
_ACCENT = ["café", "naïve", "résumé", "über", "señor"]


def _vocab(seed: int) -> list[str]:
    """~5k deterministic identifiers: syllable combos, camel + snake."""
    rng = np.random.default_rng(seed ^ 0x5EED)
    out = []
    n = len(_SYL)
    for i in range(5000):
        a, b, c = rng.integers(0, n, 3)
        style = i % 3
        if style == 0:
            out.append(_SYL[a] + _SYL[b].capitalize())          # camelCase
        elif style == 1:
            out.append(f"{_SYL[a]}_{_SYL[b]}")                   # snake_case
        else:
            out.append(_SYL[a] + _SYL[b].capitalize() + _SYL[c].capitalize())
    return out


def _zipf_probs(n: int) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks
    return p / p.sum()


class _ChunkGen:
    """Generates one CHUNK of docs deterministically from (seed, chunk_id)."""

    def __init__(self, seed: int):
        self.seed = seed
        self.vocab = np.array(_vocab(seed))
        self.probs = _zipf_probs(len(self.vocab))
        self.comment_words = np.array(_COMMENT_WORDS)

    def _content(self, rng: np.random.Generator, gidx: int) -> str:
        if gidx % 131 == 0:
            return ""  # empty-content rows
        n_lines = int(rng.integers(5, 60))
        idents = rng.choice(self.vocab, size=n_lines * 4, p=self.probs)
        nums = rng.integers(0, 10_000, n_lines)
        floats = rng.integers(0, 1000, n_lines)
        kind = rng.integers(0, 10, n_lines)
        cw = rng.choice(self.comment_words, size=n_lines * 6)
        lines = []
        for i in range(n_lines):
            a, b, c, d = idents[4 * i : 4 * i + 4]
            k = kind[i]
            if k < 5:
                lines.append(f"{a} = {b}({c}, {d}) + {nums[i]}")
            elif k < 7:
                lines.append(
                    f"def {a}({b}, {c}=0x{nums[i]:X}): return {d} * "
                    f"{floats[i]}.{nums[i] % 100:02d}"
                )
            elif k < 9:
                words = " ".join(cw[6 * i : 6 * i + 6])
                lines.append(f"# {words}")
            else:
                lines.append(f'{a} = "{b} {c}" if {d} else None')
        if gidx % 101 == 7:  # unicode docs (~1%)
            rng2 = np.random.default_rng(gidx)
            cjk = "".join(
                _CJK[j] for j in rng2.integers(0, len(_CJK), 8)
            )
            lines.append(f"# {cjk} {_ACCENT[gidx % len(_ACCENT)]}")
        if gidx % 5003 == 1:  # rare wide "vendored blob" rows
            lines.append("BLOB = '" + "A0" * 150_000 + "'")
        return "\n".join(lines)

    def chunk(self, chunk_id: int, num_docs_total: int) -> dict:
        start = chunk_id * CHUNK
        count = min(CHUNK, num_docs_total - start)
        rng = np.random.default_rng((self.seed << 20) ^ chunk_id)
        lang_idx = rng.choice(len(LANGS), size=count, p=LANG_W)
        repos, paths, commits, langs, contents = [], [], [], [], []
        for k in range(count):
            gidx = start + k
            lang = LANGS[int(lang_idx[k])]
            repo = f"org{gidx % 7}/proj{gidx % 13}"
            path = (f"src/pkg{gidx % 29}/mod{(gidx // 29) % 17}/"
                    f"file{gidx}.{EXT[lang]}")
            content = self._content(rng, gidx)
            commit = hashlib.sha1(
                f"{repo}:{path}:{gidx}".encode()
            ).hexdigest()
            repos.append(repo)
            paths.append(path)
            commits.append(commit)
            langs.append(lang)
            contents.append(content)
        # exact duplicates: doc i copies doc i-1's content (same chunk)
        for k in range(count):
            if (start + k) % 97 == 96 and k > 0:
                contents[k] = contents[k - 1]
        return {
            "repo": repos, "path": paths, "commit": commits,
            "lang": langs, "content": contents,
        }


def generate_table(num_docs: int, seed: int = 42) -> pa.Table:
    """Local (driver-side) generation — tests and small scales."""
    gen = _ChunkGen(seed)
    chunks = []
    for cid in range((num_docs + CHUNK - 1) // CHUNK):
        chunks.append(pa.table(gen.chunk(cid, num_docs)))
    return pa.concat_tables(chunks)


def write_corpus(out_dir: str, num_docs: int, seed: int = 42,
                 docs_per_file: int = 20_000) -> str:
    """Distributed generation: Ray Dataset of chunk descriptors ->
    map_batches(generate) -> partitioned parquet under ``out_dir``.

    One output file per ``docs_per_file`` range, named by range — the
    resumable-output layout (a rerun skips existing files).
    """
    import os

    import ray.data as rd

    assert docs_per_file % CHUNK == 0, "docs_per_file must align to CHUNK"
    os.makedirs(out_dir, exist_ok=True)
    n_files = (num_docs + docs_per_file - 1) // docs_per_file

    todo = []
    for f in range(n_files):
        fpath = os.path.join(out_dir, f"corpus-{f:05d}.parquet")
        if not os.path.exists(fpath):
            todo.append({"file_id": f, "path": fpath})
    if todo:
        class GenFile:
            def __init__(self):
                self.gen = _ChunkGen(seed)

            def __call__(self, batch: dict) -> dict:
                import pyarrow.parquet as pq

                for fid, fpath in zip(batch["file_id"], batch["path"]):
                    fid = int(fid)
                    start = fid * docs_per_file
                    end = min(start + docs_per_file, num_docs)
                    tables = [
                        pa.table(self.gen.chunk(cid, num_docs))
                        for cid in range(start // CHUNK, (end + CHUNK - 1) // CHUNK)
                    ]
                    tmp = str(fpath) + ".tmp"
                    # row groups = CHUNK so partition planning can slice at
                    # CHUNK granularity (plan_partitions is row-group based)
                    pq.write_table(
                        pa.concat_tables(tables), tmp, row_group_size=CHUNK
                    )
                    os.replace(tmp, str(fpath))
                return {"file_id": batch["file_id"]}

        (rd.from_items(todo)
           .map_batches(GenFile, batch_size=1, concurrency=8)
           .materialize())
    return out_dir
