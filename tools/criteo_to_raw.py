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
    # a CMake-built artifact (native/CMakeLists.txt) pre-empts the lazy
    # compile when it is at least as new as the source
    prebuilt = os.path.join(os.path.dirname(src), "criteo2raw")
    if os.path.exists(prebuilt) and os.access(prebuilt, os.X_OK) and (
        os.path.getmtime(prebuilt) >= os.path.getmtime(src)
    ):
        return prebuilt
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
    """Streaming fallback: bounded memory regardless of input size.

    Pass 1 parses TSV lines into fixed-size chunks and appends them to the
    output file. --remap runs as a second pass over the written file via
    memmap, one categorical column at a time (bincount -> rank LUT ->
    chunked rewrite) — peak memory is one counts/LUT array (~vocab-bounded),
    never the whole dataset (the native criteo_convert.cpp does the same
    two-pass scheme)."""
    import numpy as np

    dense_cols = list(range(1, 14))
    cat_cols = list(range(14, 40))
    chunk_rows = 1 << 18
    rows_written = 0
    with open(args.output, "wb") as out, open(args.input, "rb") as f:
        block = []

        def flush():
            if block:
                out.write(np.stack(block).tobytes())
                block.clear()

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
            if len(block) >= chunk_rows:
                flush()
            if args.max_rows and rows_written >= args.max_rows:
                break
        flush()

    if args.remap and rows_written:
        mm = np.memmap(
            args.output, dtype=np.int32, mode="r+", shape=(rows_written, 40)
        )
        for j in range(26):
            col_i = 14 + j
            maxv = 0
            for s in range(0, rows_written, chunk_rows):
                c = np.asarray(mm[s : s + chunk_rows, col_i])
                maxv = max(maxv, int(c.max(initial=0)))
            counts = np.zeros(maxv + 1, np.int64)
            for s in range(0, rows_written, chunk_rows):
                c = np.asarray(mm[s : s + chunk_rows, col_i])
                counts += np.bincount(c, minlength=maxv + 1)
            present = np.flatnonzero(counts)
            order = np.lexsort((present, -counts[present]))  # freq desc, key asc
            lut = np.zeros(maxv + 1, np.int32)
            lut[present[order]] = np.arange(len(present), dtype=np.int32)
            for s in range(0, rows_written, chunk_rows):
                mm[s : s + chunk_rows, col_i] = lut[
                    np.asarray(mm[s : s + chunk_rows, col_i])
                ]
        mm.flush()
        del mm
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
    exe = "" if os.environ.get("HCTR_TPU_FORCE_NUMPY") else build_native()
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
