from .codegen import generate_table, write_corpus

__all__ = ["generate_table", "write_corpus"]
