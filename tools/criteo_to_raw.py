#!/usr/bin/env python
"""Criteo TSV -> Raw binary converter (dlrm_script analog).

Builds and drives the native multithreaded converter
(native/criteo_convert.cpp — the TPU-native analog of the reference's
CUDA tools/dlrm_script raw conversion); falls back to a numpy
implementation when no C++ toolchain is available. Output: fixed-stride
int32 rows [label][13 int dense][26 categorical] per the documented MLPerf
raw layout (python_interface.md:362-383), consumable by RawReader /
NativeRawReader (which apply the log(x+1) dense transform).

--remap renumbers every categorical vocabulary by descending frequency
(id 0 = most frequent), enabling the frequent/infrequent hot/cold
embedding split (HCTR_TPU_HOT_ROWS / Solver.hot_rows) — affects only
speed, never results.
"""
import argparse
import os
import subprocess
import sys
import tempfile

NATIVE_SRC = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "native",
    "criteo_convert.cpp",
)


def build_native() -> str:
    """Compile the converter once per source mtime; returns binary path or
    empty string."""
    src = os.path.abspath(NATIVE_SRC)
    out = os.path.join(
        tempfile.gettempdir(),
        f"criteo_convert_{os.getuid()}_{int(os.path.getmtime(src))}",
    )
    if os.path.exists(out):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-pthread", src, "-o", out],
            check=True,
            capture_output=True,
        )
        return out
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"native build failed ({e}); using numpy fallback",
              file=sys.stderr)
        return ""


def convert_numpy(args) -> None:
    import numpy as np

    dense_cols = list(range(1, 14))
    cat_cols = list(range(14, 40))
    rows_written = 0
    with open(args.output, "wb") as out, open(args.input, "rb") as f:
        block = []
        for line in f:
            parts = line.rstrip(b"\n\r").split(b"\t")
            parts += [b""] * (40 - len(parts))
            row = np.zeros(40, np.int32)
            row[0] = int(parts[0] or 0)
            for j, c in enumerate(dense_cols):
                row[1 + j] = int(parts[c] or 0)
            for j, c in enumerate(cat_cols):
                v = int(parts[c], 16) if parts[c] else 0
                row[14 + j] = v % args.vocab_cap
            block.append(row)
            rows_written += 1
            if args.max_rows and rows_written >= args.max_rows:
                break
        arr = np.stack(block) if block else np.zeros((0, 40), np.int32)
        if args.remap:
            for j in range(26):
                col = arr[:, 14 + j]
                u, counts = np.unique(col, return_counts=True)
                order = np.lexsort((u, -counts))  # freq desc, key asc ties
                lut = {int(u[o]): i for i, o in enumerate(order)}
                arr[:, 14 + j] = np.vectorize(
                    lut.__getitem__, otypes=[np.int32]
                )(col)
        out.write(arr.tobytes())
    print(f"criteo_to_raw (numpy): wrote {rows_written} rows")


def main():
    p = argparse.ArgumentParser("criteo_to_raw")
    p.add_argument("--input", required=True, help="criteo day .tsv/.txt")
    p.add_argument("--output", required=True, help="raw .bin output")
    p.add_argument("--vocab_cap", type=int, default=40_000_000)
    p.add_argument("--threads", type=int, default=os.cpu_count() or 8)
    p.add_argument("--max_rows", type=int, default=0)
    p.add_argument("--remap", action="store_true")
    args = p.parse_args()
    exe = build_native()
    if exe:
        cmd = [
            exe, "--input", args.input, "--output", args.output,
            "--vocab_cap", str(args.vocab_cap),
            "--threads", str(args.threads),
        ]
        if args.max_rows:
            cmd += ["--max_rows", str(args.max_rows)]
        if args.remap:
            cmd += ["--remap"]
        subprocess.run(cmd, check=True)
    else:
        convert_numpy(args)


if __name__ == "__main__":
    main()
