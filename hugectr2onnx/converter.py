"""`hugectr2onnx.converter` shim (reference:
onnx_converter/hugectr2onnx/converter.py:22 — identical signature,
including the convert_embedding=False default; `batch_size` is an optional
extension for a fixed ONNX batch dimension)."""
from hugectr_tpu.tools.hugectr2onnx import convert  # noqa: F401

if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Convert model to ONNX")
    p.add_argument("--onnx_model_path", required=True)
    p.add_argument("--graph_config", required=True)
    p.add_argument("--dense_model", required=True)
    p.add_argument("--convert_embedding", action="store_true")
    p.add_argument("--sparse_models", nargs="*", default=None)
    p.add_argument("--ntp_file", default=None)
    p.add_argument("--graph_name", default="hugectr")
    p.add_argument("--batch_size", type=int, default=None)
    a = p.parse_args()
    convert(
        a.onnx_model_path,
        a.graph_config,
        a.dense_model,
        convert_embedding=a.convert_embedding,
        sparse_models=a.sparse_models,
        ntp_file=a.ntp_file,
        graph_name=a.graph_name,
        batch_size=a.batch_size,
    )
