"""hugectr_tpu — TPU-native CTR/recommender training framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of
NVIDIA-Merlin/HugeCTR (see SURVEY.md): hybrid-parallel training where
terabyte-scale embedding tables are model-parallel over the TPU mesh and the
dense network is data-parallel, with a HugeCTR-style Python Model API so
reference user scripts translate nearly 1:1.
"""
from .core.config import (
    AsyncParam,
    DataReaderParams,
    DataReaderSparseParam,
    DataSourceParams,
    DenseLayer,
    DenseLayerComputeConfig,
    Input,
    Layer_t,
    Solver,
)
from .core.mesh import ResourceManager
from .core.types import (
    Activation_t,
    Alignment_t,
    AllReduceAlgo,
    Check_t,
    Combiner_t,
    CommunicationStrategy,
    CompressionStrategy,
    DataReaderType_t,
    DeviceLayout,
    Distribution_t,
    Error_t,
    FcPosition_t,
    FileSystemType_t,
    HugeCTRError,
    Initializer_t,
    LrPolicy_t,
    Metric_t,
    MetricsRawType,
    MetricsType,
    Optimizer_t,
    PowerLaw_t,
    Regularizer_t,
    SourceType_t,
    TablePlacementStrategy,
    Tensor_t,
    TrainPSType_t,
    Update_t,
)
from .data.generator import DataGenerator, DataGeneratorParams
from .embedding.config import (
    Embedding_t,
    EmbeddingCollectionConfig,
    EmbeddingTableConfig,
    SparseEmbedding,
)
from .model.model import Model, TrainingCallback
from .optim.lr_schedule import LearningRateScheduler
from .optim.params import OptParams

# reference pybind class name for optimizer params (OptParamsPy)
OptParamsPy = OptParams

# Activation_t.Non alias used by reference scripts (hugectr.Activation_t.Non)
Activation_t.Non = Activation_t.NonE


def _filter_kwargs(cls, kwargs, label):
    import dataclasses as _dc

    fields = {f.name for f in _dc.fields(cls)}
    known = {k: v for k, v in kwargs.items() if k in fields}
    unknown = sorted(set(kwargs) - fields)
    if unknown:
        from .core.logger import get_logger

        get_logger().warning(
            f"{label}: ignoring GPU-specific/unknown args {unknown}"
        )
    return known


def CreateSolver(**kwargs) -> Solver:
    """Reference-parity factory (hugectr.CreateSolver). Unknown reference
    kwargs (CUDA-graph/NCCL knobs with no TPU meaning) are ignored with a
    warning so reference scripts run unmodified."""
    return Solver(**_filter_kwargs(Solver, kwargs, "CreateSolver"))


def CreateOptimizer(optimizer_type=None, **kwargs) -> OptParams:
    """Reference-parity factory (hugectr.CreateOptimizer)."""
    if optimizer_type is not None:
        kwargs["optimizer"] = optimizer_type
    # reference kwarg spellings -> OptParams fields
    if "atomic_update" in kwargs:
        kwargs.pop("atomic_update")  # SGD atomics: implicit in XLA scatter
    return OptParams(**_filter_kwargs(OptParams, kwargs, "CreateOptimizer"))


__version__ = "0.1.0"
__all__ = [
    "Model",
    "Solver",
    "CreateSolver",
    "CreateOptimizer",
    "DataReaderParams",
    "DataReaderSparseParam",
    "Input",
    "DenseLayer",
    "DenseLayerComputeConfig",
    "Layer_t",
    "EmbeddingCollectionConfig",
    "EmbeddingTableConfig",
    "SparseEmbedding",
    "Embedding_t",
    "OptParams",
    "TrainingCallback",
    "DataGenerator",
    "DataGeneratorParams",
    "LearningRateScheduler",
    "ResourceManager",
    "AsyncParam",
    "DataSourceParams",
    "OptParamsPy",
    "Error_t",
    "HugeCTRError",
    "FileSystemType_t",
    "SourceType_t",
    "TrainPSType_t",
    "Alignment_t",
    "LrPolicy_t",
    "FcPosition_t",
    "Distribution_t",
    "Tensor_t",
    "AllReduceAlgo",
    "DeviceLayout",
    "CompressionStrategy",
    "MetricsType",
    "MetricsRawType",
]
