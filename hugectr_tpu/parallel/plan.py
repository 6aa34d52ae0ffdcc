"""Embedding sharding-plan compiler.

Turns user-level table/lookup configs plus a shard strategy into static,
jit-friendly metadata consumed by the embedding collection.

Semantics mirrored from the reference (not the implementation):
  - `shard_strategy = [("mp"|"dp", [table names...])]` — reference:
    docs/source/api/hugectr_layer_book.md:1212-1231 and
    HugeCTR/embedding/common.hpp:206-268 (EmbeddingCollectionParam).
  - MP tables are row-sharded round-robin over devices: key `k` is owned by
    device `(k + rot_t) % num_shards` at local row `k // num_shards`, where
    `rot_t` is a per-table rotation (table_shard_rotation) that spreads the
    power-law head keys of different tables across shards — reference:
    HugeCTR/embedding/data_distributor/data_compression_operators.cu
    (shard partitioner) and embedding/common.hpp:253-267.
  - DP tables are replicated on every device with dense-allreduced gradients —
    reference: HugeCTR/embedding/data_parallel_embedding.cpp.
  - Lookups into tables with heterogeneous ev_size are bucketed into grouped
    lookups — reference: grouped_lookup_params in embedding/common.hpp.

TPU-first design decisions (not in the reference):
  - Within a group, all table shards are concatenated into ONE [rows, ev]
    array so every lookup in the group is a single gather (XLA/MXU friendly).
  - The ragged all-to-all of the reference is replaced by fixed-shape
    all_gather(keys) -> local masked gather/pool -> psum_scatter(partials),
    which is bandwidth-equivalent for fully-sharded tables and compiles to
    ICI-optimal collectives.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.types import Combiner_t, TablePlacementStrategy

INVALID_KEY = -1


@dataclasses.dataclass
class EmbeddingTableConfig:
    """User-facing table config (reference:
    include/embeddings/embedding_collection.hpp:33-95)."""

    name: str
    max_vocabulary_size: int  # -1 => dynamic (hash-capacity) table
    ev_size: int
    min_key: int = 0
    max_key: int = -1
    opt_params: Optional[object] = None  # per-table optimizer override
    init_scale: Optional[float] = None  # default: 1/sqrt(ev_size)
    # capacity used for dynamic tables (max_vocabulary_size == -1)
    dynamic_capacity: int = 2 ** 22
    # reference kwarg spellings (embedding_collection_wrapper.hpp):
    # opt_params_or_empty folds into opt_params; init_param_or_empty is a
    # numeric uniform bound folding into init_scale (the reference's
    # InitParams class is not pybind-registered, so a scalar is the only
    # Python-reachable form)
    opt_params_or_empty: Optional[object] = None
    init_param_or_empty: Optional[float] = None

    def __post_init__(self):
        if self.opt_params is None and self.opt_params_or_empty is not None:
            self.opt_params = self.opt_params_or_empty
        if self.init_scale is None and self.init_param_or_empty is not None:
            self.init_scale = float(self.init_param_or_empty)

    @property
    def is_dynamic(self) -> bool:
        return self.max_vocabulary_size is None or self.max_vocabulary_size < 0

    @property
    def vocabulary_size(self) -> int:
        if self.is_dynamic:
            return self.dynamic_capacity
        return self.max_vocabulary_size


@dataclasses.dataclass
class LookupConfig:
    """One embedding lookup (reference: LookupParam,
    embedding/common.hpp:155-168).

    key_lo/key_hi/key_shift implement hot/cold key windows (reference
    lineage: HybridEmbedding frequent/infrequent split; snapshot analog:
    frequent-key hash table in
    embedding/data_distributor/data_compression_operators.cu:213): a key k
    participates iff key_lo <= k < key_hi and is looked up as k - key_shift;
    other keys act as padding for THIS lookup."""

    lookup_id: int
    table: EmbeddingTableConfig
    bottom_name: str  # sparse input feature name
    top_name: str  # output tensor name
    combiner: Combiner_t
    max_hotness: int
    key_lo: int = 0
    key_hi: int = -1  # -1: no upper bound
    key_shift: int = 0
    # per-key sparse-weight feature name ("" = unweighted). Weighted lookups
    # pool sum(w_i * e_i) (mean divides by sum(w_i)) and scale row gradients
    # by w_i — reference: weighted_model_forward.cu (per-key weight multiply),
    # weighted_network_forward.cu:71 (Average divides by sp_weight_sum),
    # weighted_model_backward.cu:127 (coordinate_sp_weight grad scaling).
    sp_weight_name: str = ""

    @property
    def out_width(self) -> int:
        """Output feature width (columns * ev_size)."""
        if self.combiner == Combiner_t.Concat:
            return self.max_hotness * self.table.ev_size
        return self.table.ev_size


@dataclasses.dataclass
class ShardingPlan:
    """Strategy declaration: which tables are model-parallel vs data-parallel.

    `column_factors` (table -> factor) column-shards a table's embedding
    vector across an `ev` mesh axis (reference:
    split_column_wise_sharding_config,
    src/embeddings/embedding_collection.cpp:25-130).
    """

    strategy: List[Tuple[str, List[str]]]
    column_factors: Dict[str, int] = dataclasses.field(default_factory=dict)

    def placement_of(self, table_name: str) -> TablePlacementStrategy:
        base = table_name.split("::", 1)[0]  # hot/cold sub-tables inherit
        for kind, names in self.strategy:
            if base in names:
                return TablePlacementStrategy(kind)
        # default: model parallel (safe for any size)
        return TablePlacementStrategy.ModelParallel


@dataclasses.dataclass
class LookupMeta:
    """Per-lookup static metadata inside a group."""

    lookup_id: int
    table_index: int  # index into group's table list
    combiner: Combiner_t
    hotness: int
    slot_begin: int  # window in the group's concatenated hotness axis
    slot_end: int
    out_begin: int  # window in the group's output feature axis
    out_end: int
    top_name: str
    bottom_name: str
    key_lo: int = 0
    key_hi: int = -1
    key_shift: int = 0
    sp_weight_name: str = ""  # per-key weight feature ("" = unweighted)


@dataclasses.dataclass
class MergeMeta:
    """Tiered-split output merge: the user-visible top is the sum of the
    sub-lookup tops (mean divides by the ORIGINAL per-sample valid count).
    Two tiers for hot/cold, three when the superhot MXU tier is on."""

    top_name: str  # original user-level top
    sub_tops: List[str]
    combiner: Combiner_t
    bottom_name: str
    # weighted lookups: the mean merge divides by the raw-valid sp-weight
    # SUM (reference: weighted_network_forward.cu:71), not the key count
    sp_weight_name: str = ""


@dataclasses.dataclass
class GroupPlan:
    """Compiled static plan for one (placement, ev_size, compute_kind) group.

    compute_kind:
      - "rowop": gather/scatter row-granular engine (any vocab).
      - "onehot": small-vocab MXU engine — forward is a counts-matrix matmul
        ``counts[B, V] @ table[V, E]`` and backward is ``countsᵀ @ d_out``
        with a dense touched-masked optimizer sweep. TPU-first replacement
        for the reference's per-row lookup kernels on small tables (the
        reference planner likewise special-cases small tables as DP,
        samples/dlrm/sharding/planner.py); tables are replicated.
    """

    name: str
    placement: TablePlacementStrategy
    ev_size: int
    tables: List[EmbeddingTableConfig]
    lookups: List[LookupMeta]
    num_shards: int
    # static numpy metadata
    table_vocab: np.ndarray  # [T] global vocab per table
    rows_per_shard: np.ndarray  # [T] local rows per table per shard
    local_offsets: np.ndarray  # [T] row offset of each table in local storage
    total_local_rows: int  # R: rows in the per-device storage
    slot_table: np.ndarray  # [H] table index per slot
    slot_local_offset: np.ndarray  # [H] local row offset per slot
    slot_vocab: np.ndarray  # [H] vocab of the slot's table (for bound checks)
    slot_is_dynamic: np.ndarray  # [H] bool, dynamic (hashed) table slot
    hotness_total: int  # H
    out_width: int  # W: group output feature width
    compute_kind: str = "rowop"  # "rowop" | "onehot"
    # mesh devices (>= num_shards). num_shards = f is the table's logical
    # shard count from shard_matrix (embedding/common.hpp:253-267 partial
    # placement): key k lives in shard k % f at local row k // f, and each
    # shard is replicated mesh_size/f times across the mesh (device d serves
    # shard d % f) — per-device memory is vocab/f rows, exactly the
    # reference's per-device footprint for a table on f devices.
    mesh_size: int = 0
    # [T]/[H] per-table shard rotation: key k of table t lives in shard
    # (k + rot_t) % f at local row k // f. Plain k % f puts EVERY table's
    # power-law head (key 0) on shard 0 — measured 1.30x busiest-shard key
    # volume at alpha=1.05 on the flagship shape; a per-table-name rotation
    # restores ~1/N balance (tests/test_work_scaling.py). Derived from the
    # base table name (stable across recompiles/processes/growth).
    table_rotation: Optional[np.ndarray] = None
    slot_rotation: Optional[np.ndarray] = None

    def __post_init__(self):
        if not self.mesh_size:
            self.mesh_size = self.num_shards
        if self.table_rotation is None:
            self.table_rotation = np.array(
                [table_shard_rotation(t.name) for t in self.tables], np.int64
            )
        if self.slot_rotation is None:
            self.slot_rotation = self.table_rotation[self.slot_table]

    @property
    def is_model_parallel(self) -> bool:
        return self.placement == TablePlacementStrategy.ModelParallel

    @property
    def num_replicas(self) -> int:
        """Replica groups per shard on the mesh (1 for full sharding)."""
        if not self.is_model_parallel:
            return 1
        return self.mesh_size // self.num_shards

    @property
    def total_storage_rows(self) -> int:
        """Global rows of the concatenated storage array."""
        if self.is_model_parallel:
            return self.total_local_rows * self.mesh_size
        return self.total_local_rows

    @property
    def has_weights(self) -> bool:
        """Whether any lookup in this group carries per-key sparse weights."""
        return any(lm.sp_weight_name for lm in self.lookups)

    @property
    def grad_src_slots(self) -> int:
        """Rows per sample in the compact backward gradient source: one per
        sum/mean lookup, hotness per concat lookup."""
        from ..core.types import Combiner_t

        return sum(
            (lm.slot_end - lm.slot_begin)
            if lm.combiner == Combiner_t.Concat
            else 1
            for lm in self.lookups
        )


@dataclasses.dataclass
class CompiledEmbeddingPlan:
    groups: List[GroupPlan]
    lookups: List[LookupConfig]  # in lookup_id order
    num_shards: int
    merges: List[MergeMeta] = dataclasses.field(default_factory=list)
    # user table name -> [(internal table name, row offset)] for split tables
    table_splits: Dict[str, List[Tuple[str, int]]] = dataclasses.field(
        default_factory=dict
    )

    def group_of_lookup(self, lookup_id: int) -> Tuple[GroupPlan, LookupMeta]:
        for g in self.groups:
            for lm in g.lookups:
                if lm.lookup_id == lookup_id:
                    return g, lm
        raise KeyError(lookup_id)

    @property
    def top_names(self) -> List[str]:
        return [lk.top_name for lk in self.lookups]


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def table_shard_rotation(name: str) -> int:
    """Per-table owner rotation: key k -> shard (k + rot) % f.

    Derived from the BASE table name (hot/cold `::tier` and column `#col`
    sub-tables share their parent's rotation so row placement stays aligned
    across splits), stable across plan recompiles, processes and dynamic
    growth. Set HCTR_TPU_SHARD_ROTATION=0 to restore plain k % f."""
    import os
    import zlib

    if os.environ.get("HCTR_TPU_SHARD_ROTATION", "1") == "0":
        return 0
    base = name.split("::", 1)[0].split("#col", 1)[0]
    return zlib.crc32(base.encode()) & 0x7FFFFFFF


def hot_split_rows() -> int:
    """Frequent/infrequent split size (0 = off).

    When > 0, big static sum/mean tables are split into a replicated "hot"
    sub-table holding the first N vocabulary rows (served by the one-hot
    MXU engine) and a sharded "cold" remainder on the rowop engine. With a
    frequency-ordered vocabulary (power-law id ordering; see
    tools/criteo_preprocess.py --frequency-remap) the hot rows absorb most
    key instances, cutting row-granular gather/scatter volume several-fold.
    TPU-first analog of the reference's frequent-key machinery
    (data_compression_operators.cu:213 frequent-key hash table;
    HybridEmbedding lineage). Results are EXACT regardless of the actual
    key distribution — ordering only affects speed."""
    import os

    return int(os.environ.get("HCTR_TPU_HOT_ROWS", "0"))


def superhot_rows() -> int:
    """Third split tier (0 = off): the first N rows of each hot/cold-split
    table are peeled into a replicated sub-table served by the one-hot MXU
    engine — power-law heads concentrate a large share of key instances in
    the first few-k rows, and the counts-matrix matmul serves them at MXU
    flops cost instead of ~10ns/key scatter issue cost. Requires
    HCTR_TPU_HOT_ROWS > N and N <= HCTR_TPU_ONEHOT_VOCAB (else ignored).
    Exact for any key distribution, like the hot/cold split."""
    import os

    return int(os.environ.get("HCTR_TPU_SUPERHOT_ROWS", "0"))


def warm_split_rows() -> int:
    """Fourth split tier boundary (0 = off): rows [hot, warm) of each
    split table become a separately-stored "warm" sub-table. XLA row-op
    cost per row grows with the operand footprint (TLB reach), and
    power-law traffic concentrates in the low rows, so serving them from a
    smaller operand cuts gather/scatter cost — while the shared tier sort
    (collection._tier_sorted_rows) makes the extra tier's sort free.
    Requires HCTR_TPU_HOT_ROWS < N < table vocab."""
    import os

    return int(os.environ.get("HCTR_TPU_WARM_ROWS", "0"))


def _split_hot_cold(
    lookups: Sequence[LookupConfig], plan: ShardingPlan
) -> Tuple[List[LookupConfig], List[MergeMeta], Dict[str, List[Tuple[str, int]]]]:
    """Rewrite eligible lookups into hot+cold sub-lookup pairs."""
    hot = hot_split_rows()
    if not hot:
        return list(lookups), [], {}
    by_table: Dict[str, List[LookupConfig]] = {}
    for lk in lookups:
        by_table.setdefault(lk.table.name, []).append(lk)

    def eligible(t: EmbeddingTableConfig) -> bool:
        return (
            not t.is_dynamic
            and t.vocabulary_size >= max(4 * hot, 2 * onehot_vocab_threshold())
            and all(
                # weighted Sum/Mean split fine: weights mask per key window
                # and the mean merge divides by the raw sp-weight sum
                lk.combiner in (Combiner_t.Sum, Combiner_t.Mean)
                for lk in by_table[t.name]
            )
            and t.name not in plan.column_factors
        )

    # Tier boundaries: [0, shot) superhot (one-hot MXU engine), [shot, hot)
    # hot (small-operand rowop), [hot, V) cold (sharded rowop). The superhot
    # tier only exists when HCTR_TPU_SUPERHOT_ROWS > 0 AND it lands under
    # the one-hot vocab threshold (otherwise it would compile to rowop and
    # just fragment the hot tier).
    shot = superhot_rows()
    if not (0 < shot < hot and shot <= onehot_vocab_threshold()):
        shot = 0
    bounds = ([0, shot, hot] if shot else [0, hot])
    suffixes = (["shot", "hot", "cold"] if shot else ["hot", "cold"])
    warm = warm_split_rows()
    if warm > hot:
        bounds.append(warm)
        suffixes.insert(-1, "warm")

    out: List[LookupConfig] = []
    merges: List[MergeMeta] = []
    splits: Dict[str, List[Tuple[str, int]]] = {}
    sub_tables: Dict[str, List[EmbeddingTableConfig]] = {}
    next_id = max(lk.lookup_id for lk in lookups) + 1 if lookups else 0
    for lk in lookups:
        t = lk.table
        if not eligible(t):
            out.append(lk)
            continue
        # per-table tier list: drop boundaries at/above this table's vocab
        # (e.g. a 405k table with HCTR_TPU_WARM_ROWS=512k has no cold tier)
        tpairs = [
            (lo, sfx)
            for lo, sfx in zip(bounds, suffixes)
            if lo < t.vocabulary_size
        ]
        if t.name not in sub_tables:
            subs = []
            for i, (lo, sfx) in enumerate(tpairs):
                hi = (
                    tpairs[i + 1][0]
                    if i + 1 < len(tpairs)
                    else t.vocabulary_size
                )
                subs.append(
                    dataclasses.replace(
                        t, name=f"{t.name}::{sfx}", max_vocabulary_size=hi - lo
                    )
                )
            sub_tables[t.name] = subs
            splits[t.name] = [
                (s.name, lo) for s, (lo, _sfx) in zip(subs, tpairs)
            ]
        sub_lks = []
        for i, (sub_t, (lo, sfx)) in enumerate(zip(sub_tables[t.name], tpairs)):
            hi = tpairs[i + 1][0] if i + 1 < len(tpairs) else t.vocabulary_size
            sub_lks.append(
                dataclasses.replace(
                    lk,
                    lookup_id=(lk.lookup_id if i == 0 else next_id + i - 1),
                    table=sub_t,
                    top_name=f"{lk.top_name}::{sfx}",
                    combiner=Combiner_t.Sum,
                    key_lo=lo,
                    key_hi=hi,
                    key_shift=lo,
                )
            )
        next_id += len(sub_lks) - 1
        out.extend(sub_lks)
        merges.append(
            MergeMeta(
                top_name=lk.top_name,
                sub_tops=[s.top_name for s in sub_lks],
                combiner=lk.combiner,
                bottom_name=lk.bottom_name,
                sp_weight_name=lk.sp_weight_name,
            )
        )
    return out, merges, splits


def split_vocab_threshold() -> int:
    """Vocab above which a rowop table gets its OWN storage group.

    Measured on v5e: XLA scatter/gather cost per row grows with the operand
    footprint (TLB/page locality) — splitting a multi-GB concatenated group
    into per-table operands cut the DLRM update scatters ~2x. 0 disables."""
    import os

    return int(os.environ.get("HCTR_TPU_SPLIT_VOCAB", str(256 * 1024)))


def group_rows_threshold() -> int:
    """Max total rows per SHARED rowop storage group (0 disables).

    Many-table collections (the reference EBC benchmark's 200/510-table
    cases) concatenate hundreds of small tables into one multi-GB operand,
    pushing every row op to the large-operand cost tier (~30 ns/row TLB
    rate vs ~5-10 ns/row on sub-GB operands — measured, ROADMAP.md).
    Per-table groups fix the operand size but compile hundreds of
    sort/segsum chains. This cap bins tables greedily (first-appearance
    order) so each shared group's storage stays small while the chain
    count stays bounded: 200 tables at 64k rows with a 1M cap -> 13
    groups of ~0.5 GB each. Default off — the flagship's 26-table regime
    already uses per-table groups via HCTR_TPU_SPLIT_VOCAB."""
    import os

    return int(os.environ.get("HCTR_TPU_GROUP_ROWS", "0"))


def onehot_vocab_threshold() -> int:
    """Vocab cutoff below which static sum/mean tables use the MXU one-hot
    engine (0 disables). Break-even on v5e, re-measured after the rowop
    chain got cheap (rowwise accum + measured unique windows): the [B,vocab]
    counts-matrix traffic scales with vocab while the rowop chain is
    issue-bound per KEY, so mid-size tables moved back to rowop — DLRM
    bench: threshold 2048 -> 102.5k, 8192 -> 104.0k, 32768 -> 100.9k
    ex/s."""
    import os

    return int(os.environ.get("HCTR_TPU_ONEHOT_VOCAB", "8192"))


def onehot_scatter_ratio() -> int:
    """High-hotness one-hot eligibility ratio (0 disables).

    A table whose total hotness H satisfies ``H * ratio >= vocab`` runs on
    the one-hot MXU engine even above the small-vocab threshold, with the
    [B, vocab] counts matrix built by ONE scatter-add of B*H ones (O(K))
    instead of the O(B*vocab*H) compare chain. MEASURED SLOWER on v5e at
    the flagship operating point (100-hot 64k-vocab hot prefix, ratio
    2000: 109.8k vs 117.3k ex/s): the element scatter is issue-bound at
    ~12 ns/index — the same per-key cost as the row-op chain it replaces —
    and XLA adds a 1 GB reshape copy of the counts plus matmul traffic.
    Kept as a documented alternative backend (oracle-tested); default
    off."""
    import os

    return int(os.environ.get("HCTR_TPU_ONEHOT_SCATTER_RATIO", "0"))


def onehot_scatter_max_vocab() -> int:
    """Vocab cap for scatter-counts one-hot tables (bounds the [B, vocab]
    counts buffer: 8192 x 131072 bf16 = 2 GB)."""
    import os

    return int(os.environ.get("HCTR_TPU_ONEHOT_SCATTER_MAXV", "131072"))


def _onehot_eligible(
    lookups: Sequence[LookupConfig], threshold: int
) -> Dict[str, bool]:
    """A table runs on the one-hot MXU engine iff it is static, and EVERY
    lookup into it uses a poolable combiner (sum/mean, or concat with
    hotness 1 which is equivalent), and it is either small (<= threshold,
    compare-chain counts) or high-hotness (scatter-built counts — see
    onehot_scatter_ratio). Mixed-eligibility tables stay rowop so storage
    is never duplicated across engines."""
    by_table: Dict[str, List[LookupConfig]] = {}
    for lk in lookups:
        by_table.setdefault(lk.table.name, []).append(lk)
    ratio = onehot_scatter_ratio()
    maxv = onehot_scatter_max_vocab()
    out: Dict[str, bool] = {}
    for name, lks in by_table.items():
        t = lks[0].table
        hot_total = sum(lk.max_hotness for lk in lks)
        size_ok = (threshold > 0 and 0 < t.vocabulary_size <= threshold) or (
            threshold > 0  # ONEHOT_VOCAB=0 disables the engine entirely
            and ratio > 0
            and threshold < t.vocabulary_size <= maxv
            and hot_total * ratio >= t.vocabulary_size
        )
        ok = (
            size_ok
            and not t.is_dynamic
            # weighted lookups ride the engine since round 5: the counts
            # matrix carries per-key weights and the touch column sums
            # |counts| (signed weights could cancel a genuinely touched
            # row's colsum while its grad stays nonzero — see _onehot_grad)
            and all(
                lk.combiner in (Combiner_t.Sum, Combiner_t.Mean)
                or (lk.combiner == Combiner_t.Concat and lk.max_hotness == 1)
                for lk in lks
            )
        )
        out[name] = ok
    return out


def _shard_count_of(
    table: EmbeddingTableConfig,
    shard_counts: Optional[Dict[str, int]],
    num_shards: int,
) -> int:
    """Per-table logical shard count f from the shard_matrix (partial
    placement, embedding/common.hpp:253-267). f must divide the mesh size;
    other values widen to the next divisor. Absent/0 -> full mesh."""
    if not shard_counts:
        return num_shards
    base = table.name.split("::", 1)[0].split("#col", 1)[0]
    f = int(shard_counts.get(base, 0) or num_shards)
    f = max(1, min(f, num_shards))
    while num_shards % f:
        f += 1
    return f


def compile_plan(
    lookups: Sequence[LookupConfig],
    plan: ShardingPlan,
    num_shards: int,
    shard_counts: Optional[Dict[str, int]] = None,
) -> CompiledEmbeddingPlan:
    """Compile lookup configs + strategy into grouped static metadata.

    Groups are keyed by (placement, ev_size, compute_kind, shard_count): all
    lookups whose tables share a placement, embedding-vector size and engine
    are fused into a single storage array and a single gather/matmul (analog
    of grouped_lookup_params/grouped table groups,
    embedding/common.hpp:206-268). Small static tables are peeled into
    replicated "onehot" MXU groups regardless of declared placement (an
    implementation placement choice, like the reference planner putting
    small tables DP). `shard_counts` carries the per-table device counts
    derived from shard_matrix (partial placement).
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    orig_lookups = list(lookups)
    lookups, merges, table_splits = _split_hot_cold(lookups, plan)
    eligible = _onehot_eligible(lookups, onehot_vocab_threshold())
    # Group keys in deterministic order of first appearance.
    group_keys: List[Tuple] = []
    group_lookups: Dict[Tuple, List[LookupConfig]] = {}
    for lk in lookups:
        placement = plan.placement_of(lk.table.name)
        if placement == TablePlacementStrategy.DataParallel and lk.table.is_dynamic:
            raise ValueError(
                f"dynamic table {lk.table.name} cannot be data-parallel"
            )
        if eligible[lk.table.name]:
            placement = TablePlacementStrategy.DataParallel
            kind = "onehot"
            split = ""
            f = 1
        else:
            kind = "rowop"
            thr = split_vocab_threshold()
            # big tables get a private storage group: smaller scatter/gather
            # operands are measurably faster per row (TLB locality)
            split = (
                lk.table.name
                if thr and lk.table.vocabulary_size >= thr
                else ""
            )
            f = (
                _shard_count_of(lk.table, shard_counts, num_shards)
                if placement == TablePlacementStrategy.ModelParallel
                else 1
            )
        key = (placement, lk.table.ev_size, kind, split, f)
        if key not in group_lookups:
            group_lookups[key] = []
            group_keys.append(key)
        group_lookups[key].append(lk)

    # Row-capped binning of SHARED rowop groups (HCTR_TPU_GROUP_ROWS):
    # subdivide any shared group whose concatenated storage exceeds the cap
    # into per-bin groups so row ops stay on small operands without paying
    # a per-table chain for hundreds of tables.
    bin_cap = group_rows_threshold()
    if bin_cap > 0:
        new_keys: List[Tuple] = []
        new_lookups: Dict[Tuple, List[LookupConfig]] = {}
        for key in group_keys:
            placement, ev_size, kind, split, f = key
            lks = group_lookups[key]
            if kind != "rowop" or split:
                new_keys.append(key)
                new_lookups[key] = lks
                continue
            shards = f if placement == TablePlacementStrategy.ModelParallel else 1
            bin_of: Dict[str, int] = {}
            cur_bin, cur_rows = 0, 0
            for lk in lks:
                name = lk.table.name
                if name in bin_of:
                    continue
                rows = _ceil_div(int(lk.table.vocabulary_size), shards)
                if cur_rows and cur_rows + rows > bin_cap:
                    cur_bin, cur_rows = cur_bin + 1, 0
                bin_of[name] = cur_bin
                cur_rows += rows
            if cur_bin == 0:  # fits in one group — keep the un-binned name
                new_keys.append(key)
                new_lookups[key] = lks
                continue
            for lk in lks:
                bkey = (placement, ev_size, kind, f"bin{bin_of[lk.table.name]}", f)
                if bkey not in new_lookups:
                    new_lookups[bkey] = []
                    new_keys.append(bkey)
                new_lookups[bkey].append(lk)
        group_keys, group_lookups = new_keys, new_lookups

    groups: List[GroupPlan] = []
    for placement, ev_size, kind, split, f in group_keys:
        lks = group_lookups[(placement, ev_size, kind, split, f)]
        # Unique tables in first-appearance order (multiple lookups may share
        # a table — reference: hugectr_layer_book.md:1138).
        tables: List[EmbeddingTableConfig] = []
        table_index: Dict[str, int] = {}
        for lk in lks:
            if lk.table.name not in table_index:
                table_index[lk.table.name] = len(tables)
                tables.append(lk.table)

        shards = f if placement == TablePlacementStrategy.ModelParallel else 1
        table_vocab = np.array([t.vocabulary_size for t in tables], dtype=np.int64)
        rows_per_shard = np.array(
            [_ceil_div(int(v), shards) for v in table_vocab], dtype=np.int64
        )
        local_offsets = np.zeros(len(tables), dtype=np.int64)
        if len(tables) > 1:
            local_offsets[1:] = np.cumsum(rows_per_shard[:-1])
        total_local_rows = int(rows_per_shard.sum())

        lookup_metas: List[LookupMeta] = []
        slot_table: List[int] = []
        slot_cursor = 0
        out_cursor = 0
        for lk in lks:
            ti = table_index[lk.table.name]
            lm = LookupMeta(
                lookup_id=lk.lookup_id,
                table_index=ti,
                combiner=lk.combiner,
                hotness=lk.max_hotness,
                slot_begin=slot_cursor,
                slot_end=slot_cursor + lk.max_hotness,
                out_begin=out_cursor,
                out_end=out_cursor + lk.out_width,
                top_name=lk.top_name,
                bottom_name=lk.bottom_name,
                key_lo=lk.key_lo,
                key_hi=lk.key_hi,
                key_shift=lk.key_shift,
                sp_weight_name=lk.sp_weight_name,
            )
            lookup_metas.append(lm)
            slot_table.extend([ti] * lk.max_hotness)
            slot_cursor += lk.max_hotness
            out_cursor += lk.out_width

        slot_table_arr = np.array(slot_table, dtype=np.int32)
        slot_local_offset = local_offsets[slot_table_arr].astype(np.int64)
        slot_vocab = table_vocab[slot_table_arr]
        slot_is_dynamic = np.array(
            [tables[ti].is_dynamic for ti in slot_table_arr], dtype=bool
        )

        groups.append(
            GroupPlan(
                name=(
                    f"onehot_ev{ev_size}"
                    if kind == "onehot"
                    else f"{placement.value}_ev{ev_size}"
                    + (f"_{split}" if split else "")
                    + (
                        f"_x{f}"
                        if placement == TablePlacementStrategy.ModelParallel
                        and f != num_shards
                        else ""
                    )
                ),
                placement=placement,
                ev_size=ev_size,
                tables=tables,
                lookups=lookup_metas,
                num_shards=shards,
                mesh_size=(
                    num_shards
                    if placement == TablePlacementStrategy.ModelParallel
                    else shards
                ),
                table_vocab=table_vocab,
                rows_per_shard=rows_per_shard,
                local_offsets=local_offsets,
                total_local_rows=total_local_rows,
                slot_table=slot_table_arr,
                slot_local_offset=slot_local_offset,
                slot_vocab=slot_vocab,
                slot_is_dynamic=slot_is_dynamic,
                hotness_total=slot_cursor,
                out_width=out_cursor,
                compute_kind=kind,
            )
        )
    return CompiledEmbeddingPlan(
        groups=groups,
        lookups=orig_lookups,
        num_shards=num_shards,
        merges=merges,
        table_splits=table_splits,
    )
