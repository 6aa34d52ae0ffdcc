"""Shared parent-key sort for hot/cold tier groups (HCTR_TPU_SHARED_TIER_SORT).

On one chip, every rowop tier of a split table re-derives its windowed row
list from ONE raw-key sort (rolled so the tier's window forms a sorted
prefix) instead of sorting its own masked copy. Results must be EXACT vs
the per-tier-sort path and vs the unsplit table, including when a batch
overflows the measured valid-cap window (cond fallback on the full rolled
array).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hugectr_tpu.core.types import Combiner_t, Optimizer_t, INVALID_KEY
from hugectr_tpu.optim.params import OptParams
from hugectr_tpu.parallel.plan import (
    EmbeddingTableConfig,
    LookupConfig,
    ShardingPlan,
    compile_plan,
)
from hugectr_tpu.embedding.collection import EmbeddingCollection

VOCAB = 300_000
HOT = 2048
SHOT = 256


@pytest.fixture(autouse=True)
def enable_split(monkeypatch):
    monkeypatch.setenv("HCTR_TPU_HOT_ROWS", str(HOT))
    monkeypatch.setenv("HCTR_TPU_SUPERHOT_ROWS", str(SHOT))
    # keep the hot tier on the ROWOP engine (not one-hot) so two rowop
    # tiers share the parent sort
    monkeypatch.setenv("HCTR_TPU_ONEHOT_VOCAB", "512")
    monkeypatch.setenv("HCTR_TPU_SPLIT_VOCAB", str(256 * 1024))
    monkeypatch.setenv("HCTR_TPU_DENSE_UPDATE_ROWS", "0")


def _build(rm, hot_rows, shared, monkeypatch,
           opt_kind=Optimizer_t.RowWiseAdaGrad):
    monkeypatch.setenv("HCTR_TPU_HOT_ROWS", str(hot_rows))
    monkeypatch.setenv("HCTR_TPU_SHARED_TIER_SORT", "1" if shared else "0")
    t = EmbeddingTableConfig(name="big", max_vocabulary_size=VOCAB, ev_size=8)
    lookups = [LookupConfig(0, t, "f", "e", Combiner_t.Sum, 6)]
    plan = ShardingPlan(strategy=[("mp", ["big"])])
    compiled = compile_plan(lookups, plan, num_shards=rm.data_parallel_size)
    opt = OptParams(opt_kind, lr=0.3, initial_accu_value=0.0, epsilon=1e-7)
    ebc = EmbeddingCollection(compiled, rm, opt)
    return compiled, ebc


def _keys(rng, batch, cold_frac=0.3):
    shot = rng.integers(0, SHOT, (batch, 6))
    hot = rng.integers(SHOT, HOT, (batch, 6))
    cold = rng.integers(HOT, VOCAB, (batch, 6))
    pick = rng.random((batch, 6))
    keys = np.where(
        pick < 0.4, shot, np.where(pick < 1.0 - cold_frac, hot, cold)
    ).astype(np.int32)
    keys[pick > 0.95] = INVALID_KEY
    keys[:, 0] = np.abs(keys[:, 0])
    return keys


def _run(rm, hot_rows, shared, key_batches, dense, d, monkeypatch,
         measure=False):
    compiled, ebc = _build(rm, hot_rows, shared, monkeypatch)
    if hot_rows and shared:
        tier_groups = [
            g for g in compiled.groups
            if g.compute_kind == "rowop" and g.lookups[0].key_hi >= 0
        ]
        assert tier_groups and all(
            ebc._tier_shared_ok(g) for g in tier_groups
        ), "shared tier sort did not engage"
    tables = ebc.init(jax.random.key(1))
    tables = ebc.import_table(tables, "big", dense)
    state = ebc.init_optimizer(tables)
    if measure:
        ebc.auto_unique_caps({"f": key_batches[0]})
        assert ebc.valid_caps, "valid caps not measured"
    fwds = []
    for step, keys in enumerate(key_batches, start=1):
        fwd = jax.jit(ebc.forward)(tables, {"f": keys})
        tables, state = jax.jit(ebc.backward_and_update)(
            tables, state, {"f": keys}, {"e": d}, jnp.asarray(0.3),
            jnp.asarray(step),
        )
        fwds.append(np.asarray(fwd["e"]))
    return fwds, ebc.export_table(tables, "big")


@pytest.mark.parametrize("measure", [False, True])
def test_shared_matches_per_tier_and_unsplit(mesh1, measure, monkeypatch):
    rng = np.random.default_rng(11)
    batch = 512
    batches = [_keys(rng, batch), _keys(rng, batch)]
    d = rng.normal(size=(batch, 8)).astype(np.float32)
    dense = rng.normal(size=(VOCAB, 8)).astype(np.float32)

    f_sh, t_sh = _run(mesh1, HOT, True, batches, dense, d, monkeypatch, measure=measure)
    f_ps, t_ps = _run(mesh1, HOT, False, batches, dense, d, monkeypatch, measure=measure)
    f_un, t_un = _run(mesh1, 0, False, batches, dense, d, monkeypatch, measure=False)
    for a, b in zip(f_sh, f_ps):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(t_sh, t_ps, rtol=1e-5, atol=1e-6)
    for a, b in zip(f_sh, f_un):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(t_sh, t_un, rtol=1e-4, atol=1e-5)


def test_shared_overflow_cond_is_exact(mesh1, monkeypatch):
    """Measure windows on a cold-light batch, then overflow them with a
    cold-heavy batch: the cond fallback (full rolled array) must stay exact
    vs the per-tier-sort path."""
    rng = np.random.default_rng(13)
    batch = 512
    light = _keys(rng, batch, cold_frac=0.05)
    heavy = _keys(rng, batch, cold_frac=0.9)
    d = rng.normal(size=(batch, 8)).astype(np.float32)
    dense = rng.normal(size=(VOCAB, 8)).astype(np.float32)
    f_sh, t_sh = _run(mesh1, HOT, True, [light, heavy], dense, d, monkeypatch, measure=True)
    f_ps, t_ps = _run(mesh1, HOT, False, [light, heavy], dense, d, monkeypatch, measure=True)
    for a, b in zip(f_sh, f_ps):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(t_sh, t_ps, rtol=1e-5, atol=1e-6)


def test_warm_tier_four_way_matches_unsplit(mesh1, monkeypatch):
    """HCTR_TPU_WARM_ROWS: shot/hot/warm/cold 4-way split stays exact, and a
    table smaller than the warm boundary drops the cold tier (clamping)."""
    monkeypatch.setenv("HCTR_TPU_WARM_ROWS", str(32768))
    # per-tier storage groups (multi-table tier groups decline the shared
    # sort — different key windows per lookup)
    monkeypatch.setenv("HCTR_TPU_SPLIT_VOCAB", "1024")
    rng = np.random.default_rng(17)
    batch = 256
    batches = [_keys(rng, batch, cold_frac=0.5)]
    d = rng.normal(size=(batch, 8)).astype(np.float32)
    dense = rng.normal(size=(VOCAB, 8)).astype(np.float32)
    f_w, t_w = _run(mesh1, HOT, True, batches, dense, d, monkeypatch)
    monkeypatch.setenv("HCTR_TPU_WARM_ROWS", "0")
    f_un, t_un = _run(mesh1, 0, False, batches, dense, d, monkeypatch)
    np.testing.assert_allclose(f_w[0], f_un[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(t_w, t_un, rtol=1e-4, atol=1e-5)
    # clamping: warm boundary above this table's vocab -> no cold tier
    monkeypatch.setenv("HCTR_TPU_WARM_ROWS", str(VOCAB + 1))
    compiled, _ebc = _build(mesh1, HOT, True, monkeypatch)
    names = {t.name for g in compiled.groups for t in g.tables}
    assert "big::warm" in names and "big::cold" not in names
