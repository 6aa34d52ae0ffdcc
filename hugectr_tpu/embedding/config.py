"""User-facing embedding configuration API.

Mirrors the reference Python surface (reference:
HugeCTR/include/embeddings/embedding_collection.hpp:96-199
``EmbeddingCollectionConfig::{embedding_lookup, shard}`` and the legacy
``hugectr.SparseEmbedding`` wrapper, include/pybind/model.hpp) so reference
user scripts translate 1:1. These are declarative objects consumed by
``hugectr_tpu.Model``; the plan compiler (parallel/plan.py) turns them into
static sharding metadata.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

from ..core.types import Combiner_t, CommunicationStrategy
from ..parallel.plan import EmbeddingTableConfig, LookupConfig, ShardingPlan

__all__ = [
    "EmbeddingTableConfig",
    "EmbeddingCollectionConfig",
    "SparseEmbedding",
    "Embedding_t",
]


class Embedding_t:
    """Legacy embedding kinds (reference: include/common.hpp:145-149)."""

    DistributedSlotSparseEmbeddingHash = "DistributedSlotSparseEmbeddingHash"
    LocalizedSlotSparseEmbeddingHash = "LocalizedSlotSparseEmbeddingHash"


def _as_list(x, n: Optional[int] = None) -> List:
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x] * (n or 1)


@dataclasses.dataclass
class _LookupDecl:
    table: EmbeddingTableConfig
    bottom_name: str
    top_name: str  # user-level top (may be shared by several lookups)
    combiner: Combiner_t
    sp_weight_name: str = ""  # per-key weight feature ("" = unweighted)


class EmbeddingCollectionConfig:
    """Builder for an embedding collection (reference API parity:
    ebc_config.embedding_lookup(...); ebc_config.shard(...))."""

    def __init__(
        self,
        use_exclusive_keys: bool = False,
        comm_strategy: CommunicationStrategy = CommunicationStrategy.Uniform,
    ):
        self.use_exclusive_keys = use_exclusive_keys
        self.comm_strategy = CommunicationStrategy(comm_strategy)
        self.lookup_decls: List[_LookupDecl] = []
        self.shard_matrix: Optional[List[List[str]]] = None
        self.shard_strategy: Optional[List[Tuple[str, List[str]]]] = None
        self.column_factors: Dict[str, int] = {}

    def embedding_lookup(
        self,
        table_config: Union[EmbeddingTableConfig, Sequence[EmbeddingTableConfig]],
        bottom_name: Union[str, Sequence[str]],
        top_name: Union[str, Sequence[str]],
        combiner: Union[str, Sequence[str]],
        sp_weight_name: Union[str, Sequence[str]] = "",
    ) -> None:
        """Register one or many lookups. List args broadcast like the
        reference (samples/dlrm/train.py:398-404): a single `top_name` shared
        by N lookups yields one batch-major concatenated output tensor.

        `sp_weight_name` names a float input feature of shape [batch,
        hotness] supplying a per-key weight for this lookup (reference:
        the weighted embedding path, weighted_mp_index_calculation.cu /
        weighted_network_forward.cu — sum pools sum(w_i*e_i), mean divides
        by sum(w_i), gradients scale by w_i). "" = unweighted."""
        tables = _as_list(table_config)
        n = len(tables)
        bottoms = _as_list(bottom_name, n)
        tops = _as_list(top_name, n)
        combs = _as_list(combiner, n)
        wnames = _as_list(sp_weight_name, n)
        if not (len(bottoms) == len(tops) == len(combs) == n) and n > 1:
            # scalar top shared across n lookups
            if len(tops) == 1:
                tops = tops * n
            if len(combs) == 1:
                combs = combs * n
            if len(bottoms) != n or len(tops) != n or len(combs) != n:
                raise ValueError("embedding_lookup: inconsistent list lengths")
        if len(wnames) == 1 and n > 1:
            wnames = wnames * n
        for t, b, tp, c, w in zip(tables, bottoms, tops, combs, wnames):
            self.lookup_decls.append(
                _LookupDecl(
                    table=t,
                    bottom_name=b,
                    top_name=tp,
                    combiner=Combiner_t(c),
                    sp_weight_name=w or "",
                )
            )

    def shard(
        self,
        shard_matrix: Sequence[Sequence[str]],
        shard_strategy: Sequence[Tuple[str, Sequence[str]]],
        column_factors: Optional[Dict[str, int]] = None,
        compression_strategy=None,
    ) -> None:
        """Declare placement (reference: hugectr_layer_book.md:1212-1231).

        `shard_matrix[d]` lists the tables resident on device d. A table
        appearing on f < num_devices rows gets f logical shards with
        mesh/f bit-identical replica groups (partial placement,
        embedding/common.hpp:253-267 semantics — vocab/f rows per device);
        full-width rows give the XLA-SPMD-natural full-mesh row sharding.
        DP tables must appear on every row like the reference requires.

        `compression_strategy` (reference shard() kwarg,
        embedding_collection_wrapper.hpp: {CompressionStrategy: [tables]}):
        accepted for config parity. This engine exchanges POOLED partials
        (psum_scatter of B x W bytes regardless of key count), so the
        reference's pre-exchange key dedup (Unique) has no separate comm
        path here; the row-op benefit is captured post-sort by the exact
        unique-prefix compaction instead (see PARITY.md §2.2).
        """
        self.shard_matrix = [list(r) for r in shard_matrix]
        self.shard_strategy = [(k, list(v)) for k, v in shard_strategy]
        self.column_factors = dict(column_factors or {})
        self.compression_strategy = compression_strategy
        dp_tables = {
            name for kind, names in self.shard_strategy if kind == "dp" for name in names
        }
        for name in dp_tables:
            for row in self.shard_matrix:
                if name not in row:
                    raise ValueError(
                        f"DP table {name!r} must be present on every device "
                        "row of shard_matrix"
                    )

    # ------------------------------------------------------------- compile
    def build_lookup_configs(self) -> List[LookupConfig]:
        """Materialize LookupConfigs; hotness comes from the Input sparse
        params at Model.compile time, patched in by the model."""
        out = []
        for i, d in enumerate(self.lookup_decls):
            out.append(
                LookupConfig(
                    lookup_id=i,
                    table=d.table,
                    bottom_name=d.bottom_name,
                    top_name=f"{d.top_name}:{i}",
                    combiner=d.combiner,
                    max_hotness=1,  # patched by Model from Input specs
                    sp_weight_name=d.sp_weight_name,
                )
            )
        return out

    def sharding_plan(self) -> ShardingPlan:
        if self.shard_strategy is None:
            # default: everything model-parallel
            return ShardingPlan(strategy=[], column_factors=self.column_factors)
        return ShardingPlan(
            strategy=[(k, v) for k, v in self.shard_strategy],
            column_factors=self.column_factors,
        )

    # user-level top -> list of per-lookup internal tops (in lookup order)
    def top_groups(self) -> Dict[str, List[str]]:
        groups: Dict[str, List[str]] = {}
        for i, d in enumerate(self.lookup_decls):
            groups.setdefault(d.top_name, []).append(f"{d.top_name}:{i}")
        return groups


@dataclasses.dataclass
class SparseEmbedding:
    """Legacy v1 embedding declaration (reference:
    hugectr.SparseEmbedding -> DistributedSlotSparseEmbeddingHash /
    LocalizedSlotSparseEmbeddingHash,
    include/embeddings/*_slot_sparse_embedding_hash.hpp).

    On TPU both variants lower onto the embedding collection: one table,
    one lookup per slot, output [batch, slot_num, ev]. The distributed
    (key % N) vs localized (slot % N) partitioning distinction is a GPU
    communication choice with no XLA analog — rows are sharded over the mesh
    either way.
    """

    embedding_type: str
    workspace_size_per_gpu_in_mb: int
    embedding_vec_size: int
    combiner: str
    sparse_embedding_name: str
    bottom_name: str
    optimizer: Optional[object] = None  # OptParams
    slot_size_array: List[int] = dataclasses.field(default_factory=list)
    max_vocabulary_size: int = 0  # optional explicit override

    def vocabulary_for(self, num_devices: int) -> int:
        if self.max_vocabulary_size > 0:
            return self.max_vocabulary_size
        if self.slot_size_array:
            return int(sum(self.slot_size_array))
        bytes_total = self.workspace_size_per_gpu_in_mb * (1 << 20) * num_devices
        return max(bytes_total // (4 * self.embedding_vec_size), 1)
