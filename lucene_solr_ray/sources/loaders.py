"""Corpus loaders: Parquet / CSV / JSON-lines sources -> ray.data.Dataset.

The Solr content-ingestion surface (``solr/core/src/java/org/apache/solr/
handler/loader/`` — CSVLoader, JsonLoader; the DataImportHandler's
flat-file entity processors) restated as Ray Data reads: each format
streams as Arrow blocks, optionally renaming/selecting fields (the
``fieldnames``/``f=`` mapping of Solr's loaders), so any downstream
pipeline (indexing, dedup, stats) is source-agnostic.

Solr's XML update format (``<add><doc><field name=..>``; XMLLoader) is
parsed natively with the stdlib parser — each file streams through a
map_batches stage emitting one row per ``<doc>``. Binary-document
extraction (Tika: PDF/DOC) is out of scope in this sandbox (no
JVM/network); the loader registry raises a clear error for those.
"""

from __future__ import annotations

import os


def load_corpus(
    path: str,
    *,
    fmt: str | None = None,
    columns: list[str] | None = None,
    rename: dict[str, str] | None = None,
):
    """Read a corpus directory/file into a Dataset.

    ``fmt`` in {"parquet", "csv", "json"} (json = newline-delimited);
    inferred from the file extension when omitted. ``rename`` maps source
    field names to index field names (Solr's ``fieldnames``/``f=`` map).
    """
    import ray.data as rd

    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        if not ext and os.path.isdir(path):
            names = os.listdir(path)
            ext = next(
                (os.path.splitext(n)[1].lstrip(".").lower() for n in names
                 if "." in n), "")
        fmt = {"jsonl": "json", "ndjson": "json"}.get(ext, ext)
    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=columns)
    elif fmt == "csv":
        ds = rd.read_csv(path)
        if columns:
            ds = ds.select_columns(columns)
    elif fmt == "json":
        ds = rd.read_json(path)
        if columns:
            ds = ds.select_columns(columns)
    elif fmt == "xml":
        ds = load_solr_xml(path)
        if columns:
            ds = ds.select_columns(columns)
    elif fmt in ("tika", "pdf", "doc"):
        raise NotImplementedError(
            f"{fmt} extraction needs Tika/JVM — unavailable in this "
            "environment (Solr's extraction contrib)"
        )
    else:
        raise ValueError(f"unknown corpus format: {fmt!r}")
    if rename:
        import pyarrow as pa

        def do_rename(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [rename.get(c, c) for c in b.column_names]
            )

        ds = ds.map_batches(do_rename, batch_format="pyarrow")
    return ds


def ingest_to_index(path: str, out_dir: str, *, fmt: str | None = None,
                    text_field: str = "content",
                    rename: dict[str, str] | None = None, **kw):
    """Loader -> staging parquet -> build_index (CSV/JSON corpora are
    staged as parquet so the partition planner gets row-group metadata)."""
    from ..index import build_index

    if fmt == "parquet" or (fmt is None and str(path).endswith("parquet")):
        return build_index(path, out_dir, text_field=text_field, **kw)
    ds = load_corpus(path, fmt=fmt, rename=rename)
    staged = os.path.join(out_dir, "_staged_corpus")
    if not os.path.isdir(staged):
        tmp = staged + ".tmp"
        ds.write_parquet(tmp)
        os.replace(tmp, staged)
    return build_index(staged, out_dir, text_field=text_field, **kw)


def _parse_solr_xml(data: bytes) -> list[dict]:
    """One Solr update-XML payload -> rows (XMLLoader semantics:
    ``solr/core/.../handler/loader/XMLLoader.java`` — <add><doc><field
    name=..>). All values are strings; multiValued fields join with
    newlines (the text-pipeline flattening of copyField)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(data)
    rows = []
    for doc in root.iter("doc"):
        row: dict = {}
        for f in doc.findall("field"):
            name = f.get("name")
            val = (f.text or "").strip()
            if name in row:
                row[name] = row[name] + "\n" + val
            else:
                row[name] = val
        rows.append(row)
    return rows


def load_solr_xml(path: str):
    """Solr update-XML corpus -> Dataset: one task per file (files are
    the natural parallel unit; a 100 TB XML corpus is many files), each
    parsed with the stdlib parser inside map_batches."""
    import pyarrow as pa
    import ray.data as rd

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".xml"))
    else:
        files = [path]
    ds = rd.from_items([{"path": f} for f in files])

    def parse(b: dict) -> pa.Table:
        rows: list[dict] = []
        for p in [str(x) for x in b["path"]]:
            with open(p, "rb") as fh:
                rows.extend(_parse_solr_xml(fh.read()))
        if not rows:
            return pa.table({})
        cols = sorted({k for r in rows for k in r})
        return pa.table({
            c: pa.array([r.get(c, "") for r in rows], pa.string())
            for c in cols
        })

    return ds.map_batches(parse, batch_size=1,
                           batch_format="numpy")


def compact_corpus(src: str, out_dir: str, *,
                   rows_per_file: int = 100_000) -> str:
    """Small-file compaction — the standard lakehouse pre-index step.

    ``plan_partitions`` (index/build.py) slices WITHIN input files but
    never spans them, so a corpus of many small parquet files caps the
    partition size at the file size (5k-doc files -> 5k-doc build tasks,
    which BASELINE.md shows drop build efficiency to ~0.4 from fixed
    costs, and ~3x the merge's term-row count from cross-partition
    duplicate terms). Compaction is ONE streaming Ray Data pass:
    read -> write with a row budget per output file; no driver
    materialization. Idempotent: skips when out_dir already has files.
    """
    import os

    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    if any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        return out_dir
    ds = rd.read_parquet(src)
    n_rows = ds.count()  # parquet metadata only — no scan
    n_files = max(1, -(-n_rows // rows_per_file))
    # repartition to exactly one even block per output file
    # (min_rows_per_file alone is a per-write-task hint, not a guarantee)
    ds.repartition(n_files).write_parquet(out_dir)
    return out_dir


# ---------------------------------------------------------------------------
# HTML extraction (the solr/contrib/extraction common case without Tika)
# ---------------------------------------------------------------------------

class _HtmlText:
    """Visible-text + metadata extractor over the stdlib parser — the
    ExtractingRequestHandler's HTML path (``solr/contrib/extraction``,
    SolrContentHandler: Tika parses markup into a content stream plus
    metadata fields) restated without the JVM. script/style/template
    subtrees are dropped, block elements break words, entities decode,
    <title> and <meta name=...> map to metadata — the fields Solr Cell
    puts into ``content`` / ``title`` / arbitrary ``metadata_*``.
    Binary formats (PDF/DOC) stay out of scope (no JVM); the format
    registry raises for them."""

    _SKIP = frozenset(("script", "style", "template", "noscript"))
    _BLOCK = frozenset((
        "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
        "h1", "h2", "h3", "h4", "h5", "h6", "section", "article",
        "header", "footer", "blockquote", "pre",
    ))

    def __init__(self):
        from html.parser import HTMLParser

        outer = self

        class P(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.chunks: list[str] = []
                self.title_chunks: list[str] = []
                self.meta: dict[str, str] = {}
                self._skip = 0
                self._in_title = False

            def handle_starttag(self, tag, attrs):
                if tag in outer._SKIP:
                    self._skip += 1
                elif tag == "title":
                    self._in_title = True
                elif tag == "meta":
                    a = dict(attrs)
                    name = a.get("name") or a.get("property")
                    if name and a.get("content") is not None:
                        self.meta[name.lower()] = a["content"]
                if tag in outer._BLOCK:
                    self.chunks.append(" ")

            def handle_endtag(self, tag):
                if tag in outer._SKIP and self._skip:
                    self._skip -= 1
                elif tag == "title":
                    self._in_title = False
                if tag in outer._BLOCK:
                    self.chunks.append(" ")

            def handle_data(self, data):
                if self._skip:
                    return
                if self._in_title:
                    self.title_chunks.append(data)
                else:
                    self.chunks.append(data)

        self._cls = P

    def __call__(self, html: str) -> dict:
        p = self._cls()
        try:
            p.feed(html)
            p.close()
        except Exception:
            pass  # error-tolerant like the reference's HTML parser
        text = " ".join("".join(p.chunks).split())
        title = " ".join("".join(p.title_chunks).split())
        return {"text": text, "title": title, "meta": p.meta}


def extract_html(html: str) -> dict:
    """One-shot helper (tests / small inputs)."""
    return _HtmlText()(html)


def load_html(path: str):
    """HTML corpus -> Dataset(path, title, text, meta_description):
    one task per batch of files, the extractor class built once per
    actor-equivalent task (compiled parser reused across files)."""
    import pyarrow as pa
    import ray.data as rd

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith((".html", ".htm")))
    else:
        files = [path]
    ds = rd.from_items([{"path": f} for f in files])

    def parse(b: dict) -> pa.Table:
        ex = _HtmlText()
        paths = [str(x) for x in b["path"]]
        rows = []
        for p in paths:
            with open(p, encoding="utf-8", errors="replace") as fh:
                d = ex(fh.read())
            rows.append((p, d["title"], d["text"],
                         d["meta"].get("description", "")))
        return pa.table({
            "path": pa.array([r[0] for r in rows], pa.string()),
            "title": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "meta_description": pa.array([r[3] for r in rows],
                                         pa.string()),
        })

    return ds.map_batches(parse, batch_size=16, batch_format="numpy")
