from .tokens import tokens_table, write_tokens_parquet, derive_tokens_from_documents

__all__ = ["tokens_table", "write_tokens_parquet", "derive_tokens_from_documents"]
