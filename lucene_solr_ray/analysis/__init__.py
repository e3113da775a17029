from .analyzers import (
    NGramAnalyzer,
    ShingleAnalyzer,
    ENGLISH_STOP_WORDS,
    Analyzer,
    SimpleRegexAnalyzer,
    StandardAnalyzer,
    WhitespaceAnalyzer,
    get_analyzer,
    register_analyzer,
)
from .charfilter import CharFilteredAnalyzer, char_filter
from .tokenizer import simple_lowercase, tokenize, tokenize_with_positions

__all__ = [
    "ENGLISH_STOP_WORDS",
    "Analyzer",
    "CharFilteredAnalyzer",
    "char_filter",
    "NGramAnalyzer",
    "ShingleAnalyzer",
    "SimpleRegexAnalyzer",
    "StandardAnalyzer",
    "WhitespaceAnalyzer",
    "get_analyzer",
    "register_analyzer",
    "simple_lowercase",
    "tokenize",
    "tokenize_with_positions",
]
