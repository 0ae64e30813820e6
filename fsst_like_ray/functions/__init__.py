from . import textstats, dedup, similarity, multimodal  # noqa: F401
