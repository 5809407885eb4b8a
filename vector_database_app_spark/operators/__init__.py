from . import dedup, multimodal, rag, relational, search, textops  # noqa: F401
