"""Embedding cache library tests (reference: gpu_cache set-associative LRU)."""
import jax
import jax.numpy as jnp
import numpy as np

from hugectr_tpu.cache import EmbeddingCache, StaticTable


def test_cache_query_replace_lru():
    c = EmbeddingCache(num_sets=16, ways=2, ev=4)
    st = c.init()
    keys = jnp.asarray([5, 9, 5], jnp.int64)
    vals, hit, st = c.query(st, keys)
    assert not bool(hit.any())
    # insert 5 and 9
    ins = jnp.asarray([5, 9], jnp.int64)
    v = jnp.stack([jnp.full((4,), 5.0), jnp.full((4,), 9.0)])
    st = c.replace(st, ins, v)
    vals, hit, st = c.query(st, keys)
    assert bool(hit.all())
    np.testing.assert_allclose(np.asarray(vals[0]), 5.0)
    np.testing.assert_allclose(np.asarray(vals[1]), 9.0)
    np.testing.assert_allclose(np.asarray(vals[2]), 5.0)
    # update changes cached values, ignores misses
    st = c.update(
        st, jnp.asarray([5, 777], jnp.int64),
        jnp.stack([jnp.full((4,), 50.0), jnp.full((4,), 7.0)]),
    )
    vals, hit, st = c.query(st, jnp.asarray([5, 777], jnp.int64))
    np.testing.assert_allclose(np.asarray(vals[0]), 50.0)
    assert not bool(hit[1])


def test_cache_eviction_lru_order():
    # one set, 2 ways: fill with a,b; touch a; insert c -> b evicted
    c = EmbeddingCache(num_sets=1, ways=2, ev=2)
    st = c.init()
    a, b, cc = (jnp.asarray([x], jnp.int64) for x in (11, 22, 33))
    mk = lambda x: jnp.full((1, 2), float(x))
    st = c.replace(st, a, mk(11))
    st = c.replace(st, b, mk(22))
    _, hit, st = c.query(st, a)  # refresh a's stamp
    assert bool(hit[0])
    st = c.replace(st, cc, mk(33))
    _, hit_a, st = c.query(st, a)
    _, hit_b, st = c.query(st, b)
    _, hit_c, st = c.query(st, cc)
    assert bool(hit_a[0]) and bool(hit_c[0]) and not bool(hit_b[0])


def test_static_table():
    rng = np.random.default_rng(0)
    keys = rng.choice(10_000, 500, replace=False).astype(np.int64)
    vals = rng.normal(size=(500, 8)).astype(np.float32)
    t = StaticTable(keys, vals)
    q = np.concatenate([keys[:100], np.asarray([99999, 88888])])
    out, found = t.lookup(jnp.asarray(q))
    assert bool(found[:100].all()) and not bool(found[100:].any())
    np.testing.assert_allclose(np.asarray(out[:100]), vals[:100], rtol=1e-6)


def test_uvm_table_two_tier():
    """UvmTable: host master + device LRU front (uvm_table.hpp analog)."""
    from hugectr_tpu.cache.embedding_cache import UvmTable

    rng = np.random.default_rng(3)
    keys = np.arange(0, 10_000, 2, dtype=np.int64)  # even keys only
    vals = rng.normal(size=(len(keys), 8)).astype(np.float32)
    t = UvmTable(keys, vals, cache_capacity=256, ways=4)

    q = np.array([0, 2, 4, 998, 3], dtype=np.int64)  # 3 is absent
    out, found = t.query(q)
    np.testing.assert_array_equal(found, [True, True, True, True, False])
    np.testing.assert_allclose(out[0], vals[0], rtol=1e-6)
    np.testing.assert_allclose(out[3], vals[499], rtol=1e-6)
    assert np.all(out[4] == 0.0)
    misses_before = t.misses
    out2, found2 = t.query(q[:4])  # now cached
    assert t.misses == misses_before  # all device hits
    np.testing.assert_allclose(out2, out[:4], rtol=1e-6)

    # write-through update visible via both tiers
    t.update(np.array([2], np.int64), np.full((1, 8), 7.0, np.float32))
    out3, _ = t.query(np.array([2], np.int64))
    np.testing.assert_allclose(out3[0], 7.0)
    # evictions beyond capacity still answer from host
    big = np.arange(0, 4000, 2, dtype=np.int64)
    outb, foundb = t.query(big)
    assert foundb.all()
    np.testing.assert_allclose(outb[1], 7.0)  # key 2 was write-through-updated
    np.testing.assert_allclose(outb[2], vals[2], rtol=1e-6)
