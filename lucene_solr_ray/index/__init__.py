from .build import IndexManifest, build_index, build_segment, plan_partitions
from .merge import merge_index

__all__ = [
    "IndexManifest",
    "build_index",
    "build_segment",
    "merge_index",
    "plan_partitions",
]
