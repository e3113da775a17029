from .autoprefix import AutoPrefixReader, build_autoprefix, has_autoprefix
from .build import IndexManifest, build_index, build_segment, plan_partitions
from .check import check_index, check_merged, exorcise_index, fetch_docs
from .deletes import LiveDocs, delete_by_query, delete_docs, ttl_delete
from .merge import merge_index
from .multifield import build_multi_index
from .sorted_build import build_sorted_index, early_terminated_topk
from .split import split_by_query, split_index
from .updates import append_segment, update_documents

__all__ = [
    "AutoPrefixReader",
    "IndexManifest",
    "build_autoprefix",
    "has_autoprefix",
    "check_index",
    "exorcise_index",
    "LiveDocs",
    "delete_by_query",
    "delete_docs",
    "fetch_docs",
    "build_index",
    "build_segment",
    "build_multi_index",
    "build_sorted_index",
    "early_terminated_topk",
    "merge_index",
    "plan_partitions",
    "check_merged",
    "ttl_delete",
    "append_segment",
    "split_by_query",
    "split_index",
    "update_documents",
]
