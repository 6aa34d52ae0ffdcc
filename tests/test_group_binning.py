"""Row-capped binning of shared rowop storage groups (HCTR_TPU_GROUP_ROWS).

The many-table regime (reference EBC benchmark 200/510-table cases) pays
large-operand row-op rates when hundreds of tables share one concatenated
storage array; binning splits the shared group into sub-cap groups. Must be
EXACT (pure storage-layout change) and must actually change the compiled
grouping (reference analog: grouped table groups, embedding/common.hpp).
"""
import os

import numpy as np
import pytest

from hugectr_tpu.core.types import Combiner_t, Optimizer_t
from hugectr_tpu.optim.params import OptParams
from hugectr_tpu.parallel.plan import (
    EmbeddingTableConfig,
    LookupConfig,
    ShardingPlan,
    compile_plan,
)

from test_engine_equivalence import BASE_ENV, _batches, _run


def _many_table_model(n_tables=8, vocab=1000, ev=8):
    tables, lookups = [], []
    for i in range(n_tables):
        t = EmbeddingTableConfig(
            name=f"t{i}", max_vocabulary_size=vocab, ev_size=ev
        )
        tables.append((t, vocab))
        lookups.append(
            LookupConfig(i, t, f"f{i}", f"e{i}", Combiner_t.Sum, 3)
        )
    strategy = [("mp", [t.name for t, _ in tables])]
    return tables, lookups, strategy


def test_binning_changes_grouping_and_is_exact(mesh1, mesh8):
    tables, lookups, strategy = _many_table_model()
    opt = OptParams(Optimizer_t.AdaGrad, lr=0.1, initial_accu_value=0.0)
    rng = np.random.default_rng(5)
    batches = _batches(rng, lookups, tables)

    env_off = dict(BASE_ENV)
    env_on = dict(BASE_ENV, HCTR_TPU_GROUP_ROWS="2000")

    # structural: 8x1000-row tables with a 2000-row cap -> 4 bins
    saved = {k: os.environ.get(k) for k in env_on}
    os.environ.update(env_on)
    try:
        plan = compile_plan(
            lookups, ShardingPlan(strategy=strategy), num_shards=1
        )
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else os.environ.__setitem__(k, v)
    rowop = [g for g in plan.groups if g.compute_kind == "rowop"]
    assert len(rowop) == 4, [g.name for g in plan.groups]
    assert all(g.total_local_rows <= 2000 for g in rowop)
    # every lookup still served exactly once
    served = sorted(lm.lookup_id for g in plan.groups for lm in g.lookups)
    assert served == list(range(len(lookups)))

    ref_fwd, ref_tab = _run(mesh1, tables, lookups, strategy, opt, env_off, batches)
    for rm in (mesh1, mesh8):
        got_fwd, got_tab = _run(rm, tables, lookups, strategy, opt, env_on, batches)
        for s in range(len(batches)):
            for top in ref_fwd[s]:
                np.testing.assert_allclose(
                    got_fwd[s][top], ref_fwd[s][top], rtol=1e-5, atol=1e-6,
                    err_msg=f"fwd step {s} {top} mesh={rm.data_parallel_size}",
                )
        for name in ref_tab:
            np.testing.assert_allclose(
                got_tab[name], ref_tab[name], rtol=1e-5, atol=1e-6,
                err_msg=f"table {name} mesh={rm.data_parallel_size}",
            )


def test_single_bin_keeps_unbinned_name():
    tables, lookups, strategy = _many_table_model(n_tables=2)
    saved = os.environ.get("HCTR_TPU_GROUP_ROWS")
    os.environ["HCTR_TPU_GROUP_ROWS"] = "100000"
    try:
        plan = compile_plan(
            lookups, ShardingPlan(strategy=strategy), num_shards=1
        )
    finally:
        os.environ.pop("HCTR_TPU_GROUP_ROWS", None)
        if saved is not None:
            os.environ["HCTR_TPU_GROUP_ROWS"] = saved
    assert not any("bin" in g.name for g in plan.groups), [
        g.name for g in plan.groups
    ]
