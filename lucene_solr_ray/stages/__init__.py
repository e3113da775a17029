from . import analytics, ann, classify, clustering, dedup, textstats

__all__ = ["analytics", "ann", "classify", "clustering", "dedup",
           "textstats"]
