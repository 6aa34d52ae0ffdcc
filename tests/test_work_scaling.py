"""Multi-chip work-scaling law: per-shard row-op volume drops ~1/N.

The engine's multi-chip perf story (docs/performance.md): with owner
partitioning, each chip's rowop key volume (sorted-prefix gathers, grad
scatters) is the count of keys it OWNS — ~K/N with round-robin row sharding
(key k -> shard k % N), even under power-law skew, because hot heads spread
across shards. The pooled exchange meanwhile moves B x W bytes per group
REGARDLESS of K (psum_scatter of partials). This test instruments both at
the flagship DLRM-DCNv2 shape on 1/2/4/8-way plans using the engine's own
placement math (reference scaling target: BASELINE.md:24,
model_parallel_embedding.cpp owner partitioning).
"""
import numpy as np
import pytest
from types import SimpleNamespace

import jax.numpy as jnp

from hugectr_tpu.core.types import Combiner_t, INVALID_KEY
from hugectr_tpu.data import power_law_keys
from hugectr_tpu.embedding.collection import EmbeddingCollection, _GroupMeta
from hugectr_tpu.parallel.plan import (
    EmbeddingTableConfig,
    LookupConfig,
    ShardingPlan,
    compile_plan,
)
from hugectr_tpu.tools.flagship import (
    MLPERF_MULTI_HOT_SIZES,
    MLPERF_TABLE_SIZES,
)

BATCH = 4096
VOCAB_CAP = 2_000_000


def _flagship_lookups():
    out = []
    for i, (v, h) in enumerate(zip(MLPERF_TABLE_SIZES, MLPERF_MULTI_HOT_SIZES)):
        t = EmbeddingTableConfig(
            name=f"t{i}", max_vocabulary_size=min(v, VOCAB_CAP), ev_size=128
        )
        out.append(LookupConfig(i, t, f"f{i}", f"e{i}", Combiner_t.Sum, h))
    return out


def _batch(rng):
    feats = {}
    for i, (v, h) in enumerate(zip(MLPERF_TABLE_SIZES, MLPERF_MULTI_HOT_SIZES)):
        feats[f"f{i}"] = power_law_keys(
            rng, min(v, VOCAB_CAP), BATCH * h, alpha=1.05
        ).reshape(BATCH, h).astype(np.int32)
    return feats


def shard_rowop_counts(n_shards, feats):
    """(per-shard owned-key counts, per-shard unique-row counts, out_width
    sum) from the engine's own plan + placement math."""
    lookups = _flagship_lookups()
    plan = ShardingPlan(strategy=[("mp", [lk.table.name for lk in lookups])])
    compiled = compile_plan(lookups, plan, num_shards=n_shards)
    owned = np.zeros(n_shards, np.int64)
    uniq = np.zeros(n_shards, np.int64)
    width = 0
    for g in compiled.groups:
        if g.compute_kind != "rowop":
            continue
        meta = _GroupMeta(g)
        cols = [feats[lm.bottom_name] for lm in g.lookups]
        keys = jnp.asarray(np.concatenate(cols, axis=1))
        f = g.num_shards
        # the engine's placement (static path touches no collection state)
        valid, owner, local_row = EmbeddingCollection._slot_placement(
            SimpleNamespace(), meta, keys, f
        )
        valid = np.asarray(valid)
        owner = np.asarray(owner)
        local_row = np.asarray(local_row)
        width += g.out_width
        for s in range(f):
            mine = valid & (owner == s)
            owned[s] += int(mine.sum())
            uniq[s] += int(np.unique(local_row[mine]).size)
    return owned, uniq, width


def test_per_shard_rowop_volume_scales_inverse_n():
    rng = np.random.default_rng(42)
    feats = _batch(rng)
    owned1, uniq1, w1 = shard_rowop_counts(1, feats)
    total = int(owned1[0])
    results = {}
    for n in (2, 4, 8):
        owned, uniq, w = shard_rowop_counts(n, feats)
        # conservation: every valid key owned exactly once
        assert int(owned.sum()) == total
        # ~1/N law: the BUSIEST shard carries at most 1.25x its fair share
        # even under power-law alpha=1.05 skew (round-robin spreads heads)
        imbalance = owned.max() * n / total
        assert 1.0 <= imbalance < 1.25, (n, imbalance)
        # unique rows (update scatter volume) also bounded by fair share
        # (uniques can only split or stay when rows spread over shards)
        assert uniq.max() <= uniq1[0], (n, uniq.max(), uniq1[0])
        assert uniq.sum() >= uniq1[0]  # no row vanishes
        # exchange law: pooled output width is N-independent -> the
        # psum_scatter moves B x W bytes per group regardless of key count;
        # per-chip receive volume is B*W/N
        assert w == w1
        results[n] = (owned.max(), uniq.max())
    # monotone: busiest shard's volume strictly shrinks as N grows
    assert results[2][0] > results[4][0] > results[8][0]
    assert total / 8 <= results[8][0] < total / 8 * 1.25


def test_counts_report_for_docs(capsys):
    """Emit the docs/performance.md table (run with -s to capture)."""
    rng = np.random.default_rng(42)
    feats = _batch(rng)
    rows = []
    base = None
    for n in (1, 2, 4, 8):
        owned, uniq, w = shard_rowop_counts(n, feats)
        if base is None:
            base = owned.max()
        rows.append(
            f"| {n} | {owned.max():,} | {base / owned.max():.2f}x | "
            f"{uniq.max():,} | {BATCH * w * 2 // n:,} |"
        )
    print("\n".join(rows))
    assert len(rows) == 4
