from .collection import EmbeddingCollection
from .config import (
    Embedding_t,
    EmbeddingCollectionConfig,
    EmbeddingTableConfig,
    SparseEmbedding,
)
