"""lucene_solr_ray — a Ray-Data-native full-text indexing + BM25 search engine.

A from-scratch rebuild of the query/data-processing capabilities of Apache
Lucene/Solr 5.2 (reference at /root/reference) on ray.data.Dataset pipelines:
StandardAnalyzer-equivalent tokenization inside map_batches over Arrow,
SPIMI-style per-partition inverted segments (delta-gapped FOR/vByte postings,
block-max metadata, SmallFloat norms), groupby-term segment merge with salting
for skewed terms, and BM25 top-k scoring (Lucene k1=1.2 b=0.75 formulation,
rank-identical tie-breaks) on stateful scorer actors.
"""

__version__ = "0.1.0"
