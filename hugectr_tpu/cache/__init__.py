from .embedding_cache import EmbeddingCache, StaticTable
