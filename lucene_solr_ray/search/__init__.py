from . import bm25
from .query import (
    BooleanQuery,
    ConstantScoreQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    parse_query,
)
from .distributed import search_sharded
from .searcher import IndexSearcher
from .topk import merge_shard_topk, top_k

__all__ = [
    "BooleanQuery", "ConstantScoreQuery", "FuzzyQuery", "IndexSearcher",
    "MatchAllDocsQuery", "PhraseQuery", "PrefixQuery", "Query", "RegexpQuery",
    "TermQuery", "TermRangeQuery", "WildcardQuery", "bm25",
    "merge_shard_topk", "parse_query", "search_sharded", "top_k",
]
