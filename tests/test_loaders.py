

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
