from . import ann, dedup, textstats

__all__ = ["ann", "dedup", "textstats"]
