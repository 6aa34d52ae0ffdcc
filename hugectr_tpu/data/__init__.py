from .generator import DataGenerator, DataGeneratorParams, power_law_keys
from .reader import (
    BaseReader,
    Batch,
    BatchSpec,
    DeviceFeeder,
    AsyncParquetReader,
    NormCheckError,
    NormReader,
    ParquetReader,
    RawReader,
    SparseFeatureSpec,
    SyntheticReader,
)
