"""Core enums and type aliases.

Mirrors the semantic surface of HugeCTR's ``include/common.hpp`` enums
(reference: HugeCTR/include/common.hpp:94-155) without copying its code:
these are plain Python enums consumed by the TPU-native engine.
"""
from __future__ import annotations

import enum

import jax.numpy as jnp


class Optimizer_t(str, enum.Enum):
    """Optimizer kinds (reference: include/common.hpp optimizer enum)."""

    SGD = "sgd"
    MomentumSGD = "momentum_sgd"
    Nesterov = "nesterov"
    AdaGrad = "adagrad"
    # Row-wise AdaGrad: ONE accumulator scalar per embedding row (mean of
    # squared gradients over the row). TPU-native extension matching the
    # MLPerf DLRM reference implementation's embedding optimizer (torchrec
    # ROWWISE_ADAGRAD); dense-layer parameters fall back to element-wise
    # AdaGrad, as in the reference implementation. Cuts the sparse-update
    # state traffic from [rows, ev] to [rows, 1].
    RowWiseAdaGrad = "rowwise_adagrad"
    RMSProp = "rmsprop"
    Adam = "adam"
    FTRL = "ftrl"


class Update_t(str, enum.Enum):
    """Update semantics (reference: include/common.hpp:94 Update_t).

    On TPU all updates inside one jitted step are effectively "global"
    (gradients are fully exchanged before the update); Local/LazyGlobal are
    accepted for API parity and map onto the same fused update.
    """

    Local = "local"
    Global = "global"
    LazyGlobal = "lazy_global"


class Activation_t(str, enum.Enum):
    Relu = "relu"
    Sigmoid = "sigmoid"
    Tanh = "tanh"
    Elu = "elu"
    Gelu = "gelu"
    NonE = "none"  # matches HugeCTR's Activation_t::None spelling


class Regularizer_t(str, enum.Enum):
    NonE = "none"
    L1 = "l1"
    L2 = "l2"


class Initializer_t(str, enum.Enum):
    """Weight init schemes (reference: include/common.hpp:151)."""

    Default = "default"
    Uniform = "uniform"
    XavierNorm = "xavier_norm"
    XavierUniform = "xavier_uniform"
    Zero = "zero"


class Combiner_t(str, enum.Enum):
    """Per-lookup pooling combiner (reference: embedding/common.hpp lookups)."""

    Sum = "sum"
    Mean = "mean"
    Concat = "concat"


class TablePlacementStrategy(str, enum.Enum):
    """Shard-group strategy names (reference: hugectr_layer_book.md:1212-1231)."""

    DataParallel = "dp"
    ModelParallel = "mp"


class DataReaderType_t(str, enum.Enum):
    Norm = "norm"
    Raw = "raw"
    Parquet = "parquet"
    RawAsync = "raw_async"
    Synthetic = "synthetic"


class Check_t(str, enum.Enum):
    Sum = "sum"
    Non = "none"


class PowerLaw_t(str, enum.Enum):
    """Synthetic key distributions (reference: include/common.hpp:153-155)."""

    Long = "long"
    Medium = "medium"
    Short = "short"
    Specific = "specific"


class Metric_t(str, enum.Enum):
    AUC = "auc"
    AverageLoss = "average_loss"
    HitRate = "hit_rate"
    SMAPE = "smape"
    NDCG = "ndcg"


class Loss_t(str, enum.Enum):
    BinaryCrossEntropy = "binary_cross_entropy"
    CrossEntropy = "cross_entropy"
    MultiCrossEntropy = "multi_cross_entropy"


class EmbeddingLayout(str, enum.Enum):
    """Output layout of the embedding collection
    (reference: hugectr_layer_book.md:1186-1210)."""

    FeatureMajor = "feature_major"
    BatchMajor = "batch_major"


class CommunicationStrategy(str, enum.Enum):
    """All-to-all strategy analog (reference: embedding/common.hpp:140)."""

    Uniform = "uniform"
    Hierarchical = "hierarchical"


class CompressionStrategy(str, enum.Enum):
    """Key exchange compression (reference: embedding/common.hpp:136)."""

    Reduction = "reduction"
    Unique = "unique"


class SortStrategy(str, enum.Enum):
    Radix = "radix"
    Segmented = "segmented"


class KeysPreprocessStrategy(str, enum.Enum):
    NonE = "none"
    AddOffset = "add_offset"


# Default dtypes for the TPU engine.
DEFAULT_KEY_DTYPE = jnp.int32
DEFAULT_KEY_DTYPE_I64 = jnp.int64
DEFAULT_EMB_DTYPE = jnp.float32
DEFAULT_COMPUTE_DTYPE = jnp.float32

# Sentinel for padded (invalid) key slots in fixed-hotness layouts.
INVALID_KEY = -1
