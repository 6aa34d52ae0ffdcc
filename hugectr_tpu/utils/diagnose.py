"""Diagnostics: tensor histograms/samples/dumps + guards.

Analog of the reference diagnose helpers (HugeCTR/include/diagnose.hpp:25-37,
src/diagnose.cu) and runtime guards (NaN-loss abort model.cpp:789-793,
check_overflow model.cpp:1251-1258).
"""
from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logger import get_logger

logger = get_logger()


def histogram(name: str, arr, bins: int = 20) -> str:
    """Log + return an ASCII histogram of a tensor (reference:
    diagnose::histogram)."""
    a = np.asarray(arr, dtype=np.float64).ravel()
    finite = a[np.isfinite(a)]
    n_bad = a.size - finite.size
    if finite.size == 0:
        msg = f"{name}: ALL {a.size} values non-finite"
        logger.warning(msg)
        return msg
    counts, edges = np.histogram(finite, bins=bins)
    peak = counts.max() or 1
    lines = [
        f"histogram of {name}: shape={np.shape(arr)} min={finite.min():.5g} "
        f"max={finite.max():.5g} mean={finite.mean():.5g} std={finite.std():.5g}"
        + (f" NONFINITE={n_bad}" if n_bad else "")
    ]
    for c, lo, hi in zip(counts, edges[:-1], edges[1:]):
        bar = "#" * int(40 * c / peak)
        lines.append(f"  [{lo:+.3e}, {hi:+.3e}) {c:>9d} {bar}")
    out = "\n".join(lines)
    logger.info(out)
    return out


def sample(name: str, arr, n: int = 10) -> np.ndarray:
    """Log + return evenly spaced samples (reference: diagnose::sample)."""
    a = np.asarray(arr).ravel()
    idx = np.linspace(0, max(a.size - 1, 0), min(n, a.size)).astype(int)
    vals = a[idx]
    logger.info(f"sample of {name}: idx={idx.tolist()} vals={vals.tolist()}")
    return vals


def dump(path: str, arr) -> None:
    """Binary dump (reference: diagnose::dump)."""
    np.save(path, np.asarray(arr))


def count_nonfinite(tree) -> int:
    """Total non-finite elements across a pytree (host-side check)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        a = np.asarray(leaf)
        if np.issubdtype(a.dtype, np.floating):
            total += int((~np.isfinite(a)).sum())
    return total


def check_embedding_overflow(model) -> Dict[str, float]:
    """Max |value| per embedding group (reference: Model::check_overflow —
    hash-table capacity overflow has no TPU analog; value explosion is the
    equivalent health check). Disable via HCTR_TPU_DISABLE_OVERFLOW_CHECK."""
    if os.environ.get("HCTR_TPU_DISABLE_OVERFLOW_CHECK"):
        return {}
    out = {}
    if getattr(model, "ec", None) is None:
        return out
    for gname, arr in model.state["emb_tables"].items():
        if gname.endswith("#keys"):
            continue  # dynamic-table key stores are int ids, not values
        if gname in getattr(model.ec, "packed_groups", ()):
            # skip trailing accum columns: [R, 2E] full-packed or [R, E+1]
            # rowwise-packed — slice by the group's true ev_size
            ev = model.ec._meta[gname].plan.ev_size
            arr = arr[:, :ev]
        out[gname] = float(jnp.max(jnp.abs(arr)))
        if not np.isfinite(out[gname]) or out[gname] > 1e4:
            logger.warning(
                f"embedding group {gname}: suspicious max |value| {out[gname]}"
            )
    return out
