from . import (
    analytics,
    ann,
    boilerplate,
    classify,
    clustering,
    dedup,
    textstats,
)

__all__ = ["analytics", "ann", "boilerplate", "classify", "clustering",
           "dedup", "textstats"]
