"""Evaluation metrics: AUC, AverageLoss, HitRate, SMAPE, NDCG.

TPU-native analog of the reference metrics engine (HugeCTR/src/metrics.cu,
include/metrics.hpp): the reference streams per-batch pred/label copies into
growable buffers, then runs a multi-GPU partitioned sort + trapezoid AUC.
Here eval predictions accumulate into a preallocated batch-sharded device
buffer (static shape = max_eval_batches × batch) and finalize is one jitted
sort-based pass — XLA distributes the sort across the mesh, replacing the
hand-built find_pivots/all-to-all/partition pipeline (metrics.cu:118-366).

Exact AUC via the Mann-Whitney rank-sum with tie averaging — identical to the
reference's trapezoidal integration over all distinct thresholds
(rate_from_part_cumsum_kernel + trapz_kernel, metrics.cu:265-294).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.types import Metric_t

Array = jax.Array


@jax.jit
def auc_score(preds: Array, labels: Array, valid: Optional[Array] = None) -> Array:
    """Exact ROC-AUC of flat preds/labels (labels in {0,1}).

    Tie-aware rank-sum: AUC = (R_pos - P(P+1)/2) / (P * N) with average ranks
    for tied predictions. `valid` masks padded samples.
    """
    preds = preds.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    if valid is None:
        valid = jnp.ones_like(preds, dtype=bool)
    else:
        valid = valid.reshape(-1)
    # Push invalid entries to +inf so they land at the end after sort, with
    # label 0 contributions removed via masking.
    p = jnp.where(valid, preds, jnp.inf)
    lab = jnp.where(valid, labels, 0.0)
    order = jnp.argsort(p)
    ps = p[order]
    ls = lab[order]
    vs = valid[order].astype(jnp.float32)
    n = preds.shape[0]
    idx = jnp.arange(1, n + 1, dtype=jnp.float32)
    # average rank within tied groups: for each element, rank = mean of
    # [first, last] index of its tied run (computed via searchsorted).
    first = jnp.searchsorted(ps, ps, side="left").astype(jnp.float32) + 1.0
    last = jnp.searchsorted(ps, ps, side="right").astype(jnp.float32)
    avg_rank = (first + last) * 0.5
    pos = jnp.sum(ls * vs)
    neg = jnp.sum((1.0 - ls) * vs)
    r_pos = jnp.sum(avg_rank * ls * vs)
    auc = (r_pos - pos * (pos + 1.0) * 0.5) / jnp.maximum(pos * neg, 1.0)
    return jnp.where((pos > 0) & (neg > 0), auc, 0.5)


@jax.jit
def ndcg_score(preds: Array, labels: Array, valid: Optional[Array] = None) -> Array:
    """NDCG over the full eval set (reference: NDCG::finalize_metric_single_gpu,
    metrics.cu:1659-1700): sort by pred desc, DCG=sum(label/log2(i+2));
    IDCG from labels sorted desc."""
    preds = preds.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    if valid is None:
        valid = jnp.ones_like(preds, dtype=bool)
    else:
        valid = valid.reshape(-1)
    p = jnp.where(valid, preds, -jnp.inf)
    lab = jnp.where(valid, labels, 0.0)
    order = jnp.argsort(-p)
    ls = lab[order]
    n = preds.shape[0]
    disc = 1.0 / jnp.log2(jnp.arange(n, dtype=jnp.float32) + 2.0)
    dcg = jnp.sum(ls * disc)
    ideal = jnp.sum(jnp.sort(lab)[::-1] * disc)
    return jnp.where(ideal > 0, dcg / jnp.maximum(ideal, 1e-12), 0.0)


@jax.jit
def hitrate_score(preds: Array, labels: Array, valid: Optional[Array] = None) -> Array:
    """Fraction of (pred > 0.8) samples whose label is 1 (reference:
    collect_hits, metrics.cu:1748-1758)."""
    preds = preds.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    v = (
        jnp.ones_like(preds, bool)
        if valid is None
        else valid.reshape(-1)
    )
    checked = (preds > 0.8) & v
    hits = checked & (labels == 1.0)
    c = jnp.sum(checked.astype(jnp.float32))
    return jnp.where(c > 0, jnp.sum(hits.astype(jnp.float32)) / c, 0.0)


@jax.jit
def smape_score(preds: Array, labels: Array, valid: Optional[Array] = None) -> Array:
    """Symmetric MAPE (reference: collect_error, metrics.cu:1885-1892)."""
    preds = preds.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    v = (
        jnp.ones_like(preds, bool)
        if valid is None
        else valid.reshape(-1)
    )
    avg = (preds + labels) * 0.5
    err = jnp.where(v, jnp.abs(preds - labels) / jnp.where(avg == 0, 1.0, avg), 0.0)
    cnt = jnp.sum(v.astype(jnp.float32))
    return jnp.sum(err) / jnp.maximum(cnt, 1.0)


_AUC_EXACT_MAX = 8 * 1024 * 1024  # sort-based path cap (see auc_score_large)
_AUC_BINS_BITS = 20


@jax.jit
def auc_score_large(
    preds: Array, labels: Array, valid: Optional[Array] = None
) -> Array:
    """Binned rank-sum AUC for MLPerf-scale eval sets.

    The exact path sorts the full buffer, and XLA's 1-D sort measures
    ~360 ns/element on v5e (19.8 s at 16M, device fault at the 89M MLPerf
    eval size). This path replaces the sort with two histogram
    scatter-adds over 2^20 prediction-order bins (an order-preserving
    bit-twiddle of the f32 pattern), then closes the Mann-Whitney sum over
    bins — O(n) with ~12 ns/element scatters, no sort. Elements sharing a
    bin are treated as tied, so the result differs from the exact AUC only
    where a bin mixes pos/neg of unequal predictions: with 2^20 bins the
    per-pair error is < 2^-20 of the prediction range (measured < 1e-4 vs
    sklearn at 1M uniform samples; exact when predictions quantize coarser
    than the bins, e.g. bf16 model outputs). The reference streams into a
    similar partitioned layout before its distributed sort
    (metrics.cu:118-366); at single-chip MLPerf eval scale the binned
    closure is the TPU-native choice."""
    preds = preds.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    if valid is None:
        valid = jnp.ones_like(preds, dtype=bool)
    else:
        valid = valid.reshape(-1)
    b = jax.lax.bitcast_convert_type(preds, jnp.int32)
    # IEEE-754 order-preserving map to uint32
    key = jnp.where(b >= 0, b + jnp.int32(-2147483648), ~b).astype(jnp.uint32)
    bins = (key >> jnp.uint32(32 - _AUC_BINS_BITS)).astype(jnp.int32)
    n_bins = 1 << _AUC_BINS_BITS
    lab = jnp.where(valid, labels, 0.0)
    vf = valid.astype(jnp.float32)
    hist_pos = jnp.zeros((n_bins,), jnp.float32).at[bins].add(lab * vf)
    hist_neg = jnp.zeros((n_bins,), jnp.float32).at[bins].add((1.0 - lab) * vf)
    neg_below = jnp.cumsum(hist_neg) - hist_neg  # exclusive
    pos = jnp.sum(hist_pos)
    neg = jnp.sum(hist_neg)
    r = jnp.sum(hist_pos * (neg_below + 0.5 * hist_neg))
    auc = r / jnp.maximum(pos * neg, 1.0)
    return jnp.where((pos > 0) & (neg > 0), auc, 0.5)


def auc_score_auto(preds, labels, valid=None):
    """Exact sort-based AUC up to HCTR_TPU_AUC_EXACT_MAX elements (default
    8M), binned beyond (HCTR_TPU_AUC_EXACT=1 forces the sort path at any
    size). The sort path measures ~360 ns/element on v5e, the binned path
    ~2 scatter passes — set the threshold low (e.g. 0) to trade the <1e-4
    binned bound for fast giant-buffer finalizes."""
    import os

    n = 1
    for d in preds.shape:
        n *= d
    cap = int(os.environ.get("HCTR_TPU_AUC_EXACT_MAX", _AUC_EXACT_MAX))
    if n <= cap or os.environ.get("HCTR_TPU_AUC_EXACT") == "1":
        return auc_score(preds, labels, valid)
    return auc_score_large(preds, labels, valid)


_FINALIZERS = {
    Metric_t.AUC: auc_score_auto,
    Metric_t.NDCG: ndcg_score,
    Metric_t.HitRate: hitrate_score,
    Metric_t.SMAPE: smape_score,
}


class MetricAccumulator:
    """Streams eval batches into fixed device buffers, finalizes on demand.

    Buffers are [max_batches * batch_size] per label column, batch-sharded
    if a sharding is given. Analog of the reference Metric::local_reduce +
    finalize_metric flow (include/metrics.hpp:44-66).
    """

    def __init__(
        self,
        metrics: Dict[Metric_t, float],
        batch_size: int,
        max_batches: int,
        sharding=None,
        label_dim: int = 1,
    ):
        self.metrics = {Metric_t(k): v for k, v in metrics.items()}
        self.batch_size = batch_size
        self.max_batches = max_batches
        self.label_dim = max(1, int(label_dim))
        # each update writes batch_size*label_dim flattened values; buffers
        # and offsets are sized in those units so dim>1 labels don't clobber
        # the next batch's slot
        self.capacity = batch_size * self.label_dim * max_batches
        self.sharding = sharding
        self.reset()

    def reset(self):
        # distinct allocations: _write donates all three buffers, so they
        # must not alias each other
        def _buf(dtype):
            b = jnp.zeros((self.capacity,), dtype)
            return jax.device_put(b, self.sharding) if self.sharding is not None else b

        self._preds = _buf(jnp.float32)
        self._labels = _buf(jnp.float32)
        self._valid = _buf(bool)
        self._nb = 0
        # device loss scalars accumulate LAZILY (no per-batch host sync —
        # a float() per eval batch would serialize the async dispatch
        # queue; the one sync happens in finalize)
        self._loss_vals = []

    @staticmethod
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def _write(buf_p, buf_l, buf_v, preds, labels, offset):
        # buffers are donated: without donation every eval batch pays a full
        # copy of the [capacity] pred/label/valid buffers (measured round-5;
        # at max_eval_batches in the hundreds that copy dominates eval)
        preds = preds.reshape(-1).astype(jnp.float32)
        labels = labels.reshape(-1).astype(jnp.float32)
        buf_p = jax.lax.dynamic_update_slice(buf_p, preds, (offset,))
        buf_l = jax.lax.dynamic_update_slice(buf_l, labels, (offset,))
        buf_v = jax.lax.dynamic_update_slice(
            buf_v, jnp.ones_like(preds, bool), (offset,)
        )
        return buf_p, buf_l, buf_v

    def update(self, preds: Array, labels: Array, loss: Optional[float] = None):
        if self._nb >= self.max_batches:
            return  # reference caps at allocated eval batches as well
        off = jnp.asarray(self._nb * self.batch_size * self.label_dim, jnp.int32)
        self._preds, self._labels, self._valid = self._write(
            self._preds, self._labels, self._valid, preds, labels, off
        )
        self._nb += 1
        if loss is not None:
            self._loss_vals.append(loss)  # device scalar or float; no sync

    def update_batches(
        self, preds: Array, labels: Array, count: int, losses: Optional[Array] = None
    ):
        """Bulk write of `count` stacked eval batches ([K, batch, label_dim]
        leading-axis stacks from a scanned eval pass) in ONE device op."""
        count = min(int(count), self.max_batches - self._nb)
        if count <= 0:
            return
        n = count * self.batch_size * self.label_dim
        off = jnp.asarray(self._nb * self.batch_size * self.label_dim, jnp.int32)
        self._preds, self._labels, self._valid = self._write(
            self._preds,
            self._labels,
            self._valid,
            preds.reshape(-1)[:n],
            labels.reshape(-1)[:n],
            off,
        )
        self._nb += count
        if losses is not None:
            self._loss_vals.append(losses.reshape(-1)[:count])

    def finalize(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for m in self.metrics:
            if m == Metric_t.AverageLoss:
                # entries are device scalars (per-batch path) or [count]
                # arrays (bulk scanned path) — every batch weighs equally
                out[m.value] = (
                    float(
                        jnp.mean(
                            jnp.concatenate(
                                [
                                    jnp.atleast_1d(jnp.asarray(v))
                                    for v in self._loss_vals
                                ]
                            )
                        )
                    )
                    if self._loss_vals
                    else 0.0
                )
            else:
                out[m.value] = float(
                    _FINALIZERS[m](self._preds, self._labels, self._valid)
                )
        return out

    def check_earlystop(self, values: Dict[str, float]) -> bool:
        """True if any threshold metric crossed (reference: fit early exit,
        model.cpp:954-977). AverageLoss thresholds are ignored like the
        reference (threshold only meaningful for AUC-like metrics)."""
        for m, thr in self.metrics.items():
            if m in (Metric_t.AUC, Metric_t.HitRate, Metric_t.NDCG) and thr < 1.0:
                if values.get(m.value, 0.0) > thr:
                    return True
        return False
