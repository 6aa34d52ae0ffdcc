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
    # reference pybind spelling (samples/ftrl/dlrm_train_ftrl.py uses
    # hugectr.Optimizer_t.Ftrl) — enum alias of FTRL
    Ftrl = "ftrl"


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


class Error_t(str, enum.Enum):
    """Error taxonomy (reference: core23/error.hpp Error_t). The GPU-library
    codes (Cublas/Cudnn/Nccl/CudaDriver/CudaRuntime) have no TPU analog —
    XLA failures surface as Python exceptions — but the names are kept so
    user code matching on them still imports."""

    Success = "success"
    FileCannotOpen = "file_cannot_open"
    BrokenFile = "broken_file"
    OutOfMemory = "out_of_memory"
    OutOfBound = "out_of_bound"
    WrongInput = "wrong_input"
    IllegalCall = "illegal_call"
    NotInitialized = "not_initialized"
    EndOfFile = "end_of_file"
    UnSupportedFormat = "unsupported_format"
    InvalidEnv = "invalid_env"
    DataCheckError = "data_check_error"
    MpiError = "mpi_error"
    CudaDriverError = "cuda_driver_error"
    CudaRuntimeError = "cuda_runtime_error"
    CublasError = "cublas_error"
    CudnnError = "cudnn_error"
    NcclError = "nccl_error"
    UnspecificError = "unspecific_error"


class HugeCTRError(RuntimeError):
    """Typed runtime error carrying an Error_t (reference: HCTR_OWN_THROW)."""

    def __init__(self, error_t: Error_t, msg: str = ""):
        self.error_t = Error_t(error_t)
        super().__init__(f"[{self.error_t.name}] {msg}")


class FileSystemType_t(str, enum.Enum):
    """Remote/local filesystem backend selector (reference:
    include/io/filesystem.hpp FileSystemType_t); consumed by
    DataSourceParams and io.filesystem."""

    Local = "local"
    HDFS = "hdfs"
    S3 = "s3"
    GCS = "gcs"
    Other = "other"


class SourceType_t(str, enum.Enum):
    """Data source framing (reference: common.hpp SourceType_t)."""

    FileList = "file_list"
    Mmap = "mmap"
    Parquet = "parquet"


class TrainPSType_t(str, enum.Enum):
    """EmbeddingTrainingCache host parameter-server mode (reference:
    common.hpp TrainPSType_t; embedding_training_cache.hpp)."""

    Staged = "staged"
    Cached = "cached"


class Alignment_t(str, enum.Enum):
    """AsyncParam dense-dim alignment (reference: common.hpp Alignment_t).
    `Auto` pads the dense input to an 8-aligned width."""

    Auto = "auto"
    Non = "none"


class LrPolicy_t(str, enum.Enum):
    """LR policy (reference: parser.hpp LrPolicy_t — only `fixed` exists)."""

    fixed = "fixed"


class FcPosition_t(str, enum.Enum):
    """Fused fully-connected fusion position (reference: common.hpp
    FcPosition_t). On TPU the XLA compiler owns GEMM fusion, so this is an
    accepted-for-parity hint carried by DenseLayer.pos_type."""

    Non = "none"
    Head = "head"
    Body = "body"
    Tail = "tail"
    Isolated = "isolated"


class Distribution_t(str, enum.Enum):
    """Synthetic key distribution (reference: common.hpp Distribution_t)."""

    Uniform = "uniform"
    PowerLaw = "power_law"


class Tensor_t(str, enum.Enum):
    """Which graph a tensor is fetched from in check_out_tensor
    (reference: common.hpp Tensor_t)."""

    Train = "train"
    Evaluate = "evaluate"


class AllReduceAlgo(str, enum.Enum):
    """All-reduce algorithm choice (reference: all_reduce_comm.hpp).
    Accepted for parity — XLA's collective lowering owns algorithm
    selection on TPU (SURVEY §5 mapping)."""

    OneShot = "oneshot"
    NCCL = "nccl"


class DeviceLayout(str, enum.Enum):
    """Device map layout (reference: device_map.hpp DeviceMap::Layout).
    Mesh construction on TPU is mesh-axis-ordered; accepted for parity."""

    LocalFirst = "local_first"
    NodeFirst = "node_first"


# Reference metrics enum aliases (pybind: MetricsType / MetricsRawType).
MetricsType = Metric_t


class MetricsRawType(str, enum.Enum):
    """Raw tensors a metric consumes (reference: metrics.hpp RawType)."""

    Loss = "loss"
    Pred = "pred"
    Label = "label"


# Default dtypes for the TPU engine.
DEFAULT_KEY_DTYPE = jnp.int32
DEFAULT_KEY_DTYPE_I64 = jnp.int64
DEFAULT_EMB_DTYPE = jnp.float32
DEFAULT_COMPUTE_DTYPE = jnp.float32

# Sentinel for padded (invalid) key slots in fixed-hotness layouts.
INVALID_KEY = -1
