"""Device-resident embedding cache library.

Analog of the reference's standalone gpu_cache (gpu_cache/include/
nv_gpu_cache.hpp:54 set-associative LRU cache, static_hash_table/static_table
immutable lookup): a functional, jit-friendly set-associative cache whose
state lives in device arrays. The reference's warp-per-set CUDA kernels
become vectorized per-way compares on the VPU; the host-side consumer
(deprecated HPS in the reference) is replaced by any JAX serving loop.

State layout for capacity = num_sets * ways:
  tags   [num_sets, ways] int64   (EMPTY = -1)
  values [num_sets, ways, ev]
  stamps [num_sets, ways] int32   (LRU clock; larger = more recent)
  clock  []                int32
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EMPTY = -1


def _hash_set(keys: jax.Array, num_sets: int) -> jax.Array:
    k = keys.astype(jnp.uint32)
    k = k ^ (k >> 16)
    k = k * jnp.uint32(0x85EBCA6B)
    k = k ^ (k >> 13)
    return (k % jnp.uint32(num_sets)).astype(jnp.int32)


@dataclasses.dataclass
class EmbeddingCache:
    """Set-associative LRU cache (reference: gpu_cache_api.hpp
    Query/Replace/Update surface)."""

    num_sets: int
    ways: int
    ev: int
    dtype: object = jnp.float32

    def init(self) -> Dict[str, jax.Array]:
        return {
            "tags": jnp.full((self.num_sets, self.ways), EMPTY, jnp.int64),
            "values": jnp.zeros((self.num_sets, self.ways, self.ev), self.dtype),
            "stamps": jnp.zeros((self.num_sets, self.ways), jnp.int32),
            "clock": jnp.zeros((), jnp.int32),
        }

    # ------------------------------------------------------------------ query
    def query(
        self, state: Dict[str, jax.Array], keys: jax.Array
    ) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
        """Lookup [N] keys -> (values [N, ev], hit [N] bool, new_state).

        Hits refresh the LRU stamp (reference: Query + LRU update).
        """
        n = keys.shape[0]
        sets = _hash_set(keys, self.num_sets)
        tags = state["tags"][sets]  # [N, ways]
        match = tags == keys[:, None].astype(jnp.int64)  # [N, ways]
        hit = match.any(axis=1)
        way = jnp.argmax(match, axis=1)  # valid where hit
        vals = state["values"][sets, way]
        vals = jnp.where(hit[:, None], vals, 0)
        clock = state["clock"] + 1
        stamps = state["stamps"].at[sets, way].max(
            jnp.where(hit, clock, 0).astype(jnp.int32)
        )
        return vals, hit, {**state, "stamps": stamps, "clock": clock}

    # ---------------------------------------------------------------- replace
    def replace(
        self, state: Dict[str, jax.Array], keys: jax.Array, values: jax.Array
    ) -> Dict[str, jax.Array]:
        """Insert (or refresh) key/value pairs, evicting per-set LRU ways
        (reference: Replace). Duplicate keys in one call collapse to one slot."""
        sets = _hash_set(keys, self.num_sets)
        tags = state["tags"][sets]  # [N, ways]
        match = tags == keys[:, None].astype(jnp.int64)
        hit = match.any(axis=1)
        hit_way = jnp.argmax(match, axis=1)
        lru_way = jnp.argmin(state["stamps"][sets], axis=1)
        way = jnp.where(hit, hit_way, lru_way)
        clock = state["clock"] + 1
        new = {
            "tags": state["tags"].at[sets, way].set(keys.astype(jnp.int64)),
            "values": state["values"].at[sets, way].set(
                values.astype(self.dtype)
            ),
            "stamps": state["stamps"].at[sets, way].set(clock.astype(jnp.int32)),
            "clock": clock,
        }
        return new

    # ----------------------------------------------------------------- update
    def update(
        self, state: Dict[str, jax.Array], keys: jax.Array, values: jax.Array
    ) -> Dict[str, jax.Array]:
        """Update values of keys ALREADY cached; misses are ignored
        (reference: Update)."""
        sets = _hash_set(keys, self.num_sets)
        tags = state["tags"][sets]
        match = tags == keys[:, None].astype(jnp.int64)
        hit = match.any(axis=1)
        way = jnp.argmax(match, axis=1)
        # misses scatter out of bounds and are dropped
        safe_sets = jnp.where(hit, sets, self.num_sets)
        return {
            **state,
            "values": state["values"]
            .at[safe_sets, way]
            .set(values.astype(self.dtype), mode="drop"),
        }


class StaticTable:
    """Immutable open-addressing hash lookup (reference: static_hash_table /
    static_table): built once on host, queried on device."""

    def __init__(self, keys: np.ndarray, values: np.ndarray, load_factor=0.5):
        n = len(keys)
        cap = 1
        while cap < n / load_factor:
            cap *= 2
        self.capacity = cap
        table_keys = np.full(cap, EMPTY, np.int64)
        table_vals = np.zeros((cap, values.shape[1]), values.dtype)
        mask = cap - 1

        def h32(k: int) -> int:
            # murmur3 finalizer on the low 32 key bits (jax x64 is off by
            # default, so device probing uses the same 32-bit mix)
            x = k & 0xFFFFFFFF
            x ^= x >> 16
            x = (x * 0x85EBCA6B) & 0xFFFFFFFF
            x ^= x >> 13
            x = (x * 0xC2B2AE35) & 0xFFFFFFFF
            return x ^ (x >> 16)

        self._h32 = h32
        for k, v in zip(keys.astype(np.int64), values):
            slot = h32(int(k)) & mask
            while table_keys[slot] != EMPTY and table_keys[slot] != k:
                slot = (slot + 1) & mask
            table_keys[slot] = k
            table_vals[slot] = v
        self.keys = jnp.asarray(table_keys)
        self.values = jnp.asarray(table_vals)
        self._mask = mask
        # max probe length bounds the device-side lookup loop
        self.max_probe = 1
        for k in keys.astype(np.int64):
            slot = h32(int(k)) & mask
            probe = 1
            while table_keys[slot] != k:
                slot = (slot + 1) & mask
                probe += 1
            self.max_probe = max(self.max_probe, probe)

    def lookup(self, q: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """[N] keys -> (values [N, ev], found [N])."""
        q64 = q.astype(self.keys.dtype)
        x = q.astype(jnp.uint32)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x85EBCA6B)
        x = x ^ (x >> 13)
        x = x * jnp.uint32(0xC2B2AE35)
        x = x ^ (x >> 16)
        slot = (x & jnp.uint32(self._mask)).astype(jnp.int32)
        found = jnp.zeros(q.shape, bool)
        vals = jnp.zeros((q.shape[0], self.values.shape[1]), self.values.dtype)
        for _ in range(self.max_probe):  # static unroll, small in practice
            tk = self.keys[slot]
            m = (tk == q64) & (~found)
            vals = jnp.where(m[:, None], self.values[slot], vals)
            found = found | m
            slot = (slot + 1) & self._mask
        return vals, found


class UvmTable:
    """Host-backed table with a device cache front (reference: uvm_table.hpp
    — device HashBlock cache + host master arrays + threaded H2HCopy for
    miss filling). TPU analog: the full table lives in host memory; `query`
    serves hits from the device-resident set-associative LRU cache and
    fills misses from the host master (one vectorized host gather + one
    device Replace per batch — the compiled-world stand-in for UVM traffic).
    """

    def __init__(
        self,
        keys: np.ndarray,
        values: np.ndarray,
        cache_capacity: int,
        ways: int = 8,
        dtype=jnp.float32,
    ):
        keys = np.asarray(keys).reshape(-1)
        values = np.asarray(values)
        if len(keys) != len(values):
            raise ValueError("keys/values length mismatch")
        order = np.argsort(keys)
        self._host_keys = keys[order]
        self._host_values = values[order]
        self.ev = values.shape[1]
        num_sets = max(1, cache_capacity // ways)
        self.cache = EmbeddingCache(
            num_sets=num_sets, ways=ways, ev=self.ev, dtype=dtype
        )
        self.state = self.cache.init()
        self.hits = 0
        self.misses = 0

    def _host_lookup(self, keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        pos = np.searchsorted(self._host_keys, keys)
        pos_c = np.clip(pos, 0, len(self._host_keys) - 1)
        found = self._host_keys[pos_c] == keys
        vals = np.where(
            found[:, None], self._host_values[pos_c], 0.0
        ).astype(self._host_values.dtype)
        return vals, found

    def query(self, keys) -> Tuple[np.ndarray, np.ndarray]:
        """[N] keys -> (values [N, ev], found [N] bool). Hits come from the
        device cache; misses are filled from the host master and inserted
        (LRU replace) for subsequent queries."""
        keys_d = jnp.asarray(np.asarray(keys).reshape(-1))
        vals, hit, self.state = self.cache.query(self.state, keys_d)
        hit_h = np.asarray(hit)
        self.hits += int(hit_h.sum())
        out = np.array(vals, np.float32)  # writable host copy
        miss_idx = np.where(~hit_h)[0]
        found = hit_h.copy()
        if len(miss_idx):
            self.misses += len(miss_idx)
            miss_keys = np.asarray(keys_d)[miss_idx]
            host_vals, host_found = self._host_lookup(miss_keys)
            out[miss_idx] = host_vals
            found[miss_idx] = host_found
            fill = host_found
            if fill.any():
                self.state = self.cache.replace(
                    self.state,
                    jnp.asarray(miss_keys[fill]),
                    jnp.asarray(host_vals[fill]),
                )
        return out, found

    def update(self, keys, values) -> None:
        """Write-through: update the host master AND any cached copies."""
        keys = np.asarray(keys).reshape(-1)
        values = np.asarray(values)
        pos = np.searchsorted(self._host_keys, keys)
        pos_c = np.clip(pos, 0, len(self._host_keys) - 1)
        found = self._host_keys[pos_c] == keys
        self._host_values[pos_c[found]] = values[found]
        self.state = self.cache.update(
            self.state, jnp.asarray(keys), jnp.asarray(values)
        )
