"""Auto-sharding planner tests (reference semantics:
samples/dlrm/sharding/planner.py)."""
import numpy as np
import pytest

from hugectr_tpu.parallel.planner import (
    PlannerCostModel,
    auto_plan,
    round_robin_plan,
    uniform_plan,
)


def test_round_robin_and_uniform():
    names = [f"t{i}" for i in range(5)]
    strat, matrix = round_robin_plan(names, 2)
    assert strat == [("mp", names)]
    assert matrix[0] == ["t0", "t2", "t4"] and matrix[1] == ["t1", "t3"]
    strat, matrix = uniform_plan(names, 3)
    assert all(row == names for row in matrix)


def test_auto_plan_dp_split_and_capacity():
    names = ["big_hot", "big_cold", "tiny1", "tiny2"]
    sizes = [8e9, 8e9, 1e6, 2e6]
    hotness = [80, 5, 1, 1]
    strat, matrix = auto_plan(
        names,
        sizes,
        hotness,
        num_devices=4,
        cost_model=PlannerCostModel(mem_capacity_bytes=10e9),
        dp_threshold_bytes=1e7,
    )
    kinds = dict(strat)
    assert set(kinds["dp"]) == {"tiny1", "tiny2"}
    assert set(kinds["mp"]) == {"big_hot", "big_cold"}
    # dp tables on every device
    for row in matrix:
        assert "tiny1" in row and "tiny2" in row
    # every mp table is placed somewhere
    placed = set(t for row in matrix for t in row)
    assert placed == set(names)


def test_auto_plan_oom_raises():
    with pytest.raises(MemoryError):
        auto_plan(
            ["huge"],
            [100e9],
            [10],
            num_devices=2,
            cost_model=PlannerCostModel(mem_capacity_bytes=1e9),
        )
