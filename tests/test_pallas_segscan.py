"""Pallas segmented-scan kernel vs numpy oracle (interpret mode on CPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

from hugectr_tpu.ops.pallas.segscan import segmented_sum_sorted


@pytest.mark.parametrize("k,e,block", [(1024, 8, 128), (2048, 128, 512)])
def test_segscan_matches_numpy(k, e, block):
    rng = np.random.default_rng(0)
    # random sorted segment ids
    seg_ids = np.sort(rng.integers(0, k // 3, k))
    heads = np.concatenate([[True], seg_ids[1:] != seg_ids[:-1]])
    vals = rng.normal(size=(k, e)).astype(np.float32)
    out = np.asarray(segmented_sum_sorted(jnp.asarray(vals), jnp.asarray(heads), block=block))
    # oracle: inclusive running sums per segment
    want = np.zeros_like(vals)
    run = np.zeros(e, np.float32)
    for i in range(k):
        if heads[i]:
            run = np.zeros(e, np.float32)
        run = run + vals[i]
        want[i] = run
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_segscan_single_segment_and_all_heads():
    k, e = 256, 16
    vals = np.ones((k, e), np.float32)
    # one giant segment spanning blocks
    heads = np.zeros(k, bool)
    heads[0] = True
    out = np.asarray(segmented_sum_sorted(jnp.asarray(vals), jnp.asarray(heads), block=64))
    np.testing.assert_allclose(out[-1], k)
    np.testing.assert_allclose(out[:, 0], np.arange(1, k + 1))
    # every row its own segment
    heads = np.ones(k, bool)
    out = np.asarray(segmented_sum_sorted(jnp.asarray(vals), jnp.asarray(heads), block=64))
    np.testing.assert_allclose(out, vals)
