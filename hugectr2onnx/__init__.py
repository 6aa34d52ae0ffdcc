"""Drop-in `hugectr2onnx` package (reference: onnx_converter/hugectr2onnx).

Reference users run::

    from hugectr2onnx import converter
    converter.convert(onnx_model_path, graph_config, dense_model, ...)

This shim forwards to :mod:`hugectr_tpu.tools.hugectr2onnx`, which writes
the ONNX protobuf without an `onnx` package dependency.
"""
from . import converter  # noqa: F401
from .converter import convert  # noqa: F401
