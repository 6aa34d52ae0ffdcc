"""Host-spill tier for EBC dynamic tables (HierarchicalKV analog).

The reference serves beyond-HBM vocabularies with a host-memory tier under
the device table (SOK HierarchicalKV backend, sparse_operation_kit hkv
lineage; vendored HKV under embedding_storage/dynamic_embedding.cu;
EmbeddingTrainingCache's staged host parameter server,
include/embedding_training_cache/embedding_training_cache.hpp:26-70).

TPU analog: the model's dynamic table (exact probed key store, fixed
``dynamic_capacity`` device working set) is backed by a growing HOST master.
``stage_batch(keys)`` runs host-side BETWEEN steps (shapes are static under
jit, so tier migration cannot happen inside the compiled step — same
reasoning as ``grow_dynamic_capacity``).

Round-5 performance rework (the round-4 version was a correctness analog —
full device-store readback per batch, per-key Python dict walks, whole-set
eviction):

- **Incremental residency mirror**: a sorted int32 array of keys believed
  device-resident, merged with each batch's keys on the host (NO device
  readback on the steady-state path — readback happens only at spill /
  resync). A key that insert-on-backward fails to place (probe clustering)
  would be wrongly believed resident until the next resync;
  ``resync_interval`` bounds that window (the engine itself drops such a
  key's update for the step either way — raise dynamic_capacity).
- **Vectorized host master**: an open-addressed int64->row numpy map
  (splitmix probe, batched linear probing) — upserts/lookups are a few
  vector ops per batch, not per-key dict hits.
- **Clock/LRU subset eviction**: every resident key carries a last-use
  stamp; ``spill(evict_frac)`` flushes and evicts only the
  least-recently-used fraction, so the hot working set survives the spill
  (HKV evicts cold buckets the same way). The master therefore holds the
  values keys had WHEN EVICTED — a still-resident key's master row is
  stale by design (it keeps training on device and is re-flushed at its
  next eviction); read live values through the model, not ``lookup_host``.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.logger import get_logger

logger = get_logger()

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _pad_pow2(arrs, axis0_pad_src=0):
    """Pad each array's leading dim to the next power of two by REPEATING
    row `axis0_pad_src` — staging scatters (.set of identical values) and
    evict probes are idempotent under repeats, and bucketed shapes keep the
    jitted scatter/evict programs CACHED (every distinct row count would
    otherwise pay a fresh compile — measured 20-40 s each through the
    remote-compile tunnel, which turned per-step staging into a
    recompilation storm)."""
    n = arrs[0].shape[0]
    if n == 0:
        return arrs
    cap = 1 << int(np.ceil(np.log2(n)))
    pad = cap - n
    if pad == 0:
        return arrs
    out = []
    for a in arrs:
        rep = np.repeat(a[axis0_pad_src : axis0_pad_src + 1], pad, axis=0)
        out.append(np.concatenate([a, rep], axis=0))
    return out


class _NpMap:
    """Vectorized open-addressed int64 -> int32 row map (append-only rows,
    like the SOK hkv twin's steady state)."""

    def __init__(self, cap: int = 4096):
        cap = 1 << int(np.ceil(np.log2(max(cap, 1024))))
        self._keys = np.full(cap, -1, np.int64)
        self._rows = np.full(cap, -1, np.int32)
        self.size = 0

    def _slots(self, keys: np.ndarray) -> np.ndarray:
        h = keys.astype(np.uint64) * _MIX
        return ((h >> np.uint64(33)) % np.uint64(self._keys.size)).astype(
            np.int64
        )

    def _grow(self):
        old_k, old_r = self._keys, self._rows
        self._keys = np.full(old_k.size * 2, -1, np.int64)
        self._rows = np.full(old_k.size * 2, -1, np.int32)
        live = old_k >= 0
        self.size = 0
        self._insert(old_k[live], old_r[live])

    def _insert(self, keys: np.ndarray, rows: np.ndarray):
        # grow BEFORE inserting: a batch larger than the free-slot count
        # would otherwise spin forever in the probe loop (growth used to be
        # checked only after the insert — found by review, live repro:
        # upsert of 10k keys into a fresh 4096-slot map hung)
        while (self.size + keys.size) > 0.7 * self._keys.size:
            self._grow()
        slot = self._slots(keys)
        pending = np.arange(keys.size)
        cap = self._keys.size
        while pending.size:
            s = slot[pending]
            empty = self._keys[s] == -1
            same = self._keys[s] == keys[pending]
            # claim empty slots (first writer per slot wins within the batch:
            # np scatter keeps the LAST duplicate, so dedup slots first)
            claim_idx = pending[empty]
            s_claim = s[empty]
            uniq_s, first = np.unique(s_claim, return_index=True)
            self._keys[uniq_s] = keys[claim_idx[first]]
            self._rows[uniq_s] = rows[claim_idx[first]]
            self.size += uniq_s.size
            # re-check: survivors are keys not yet stored at their slot
            done = self._keys[slot[pending]] == keys[pending]
            done |= same
            pending = pending[~done]
            slot[pending] = (slot[pending] + 1) % cap

    def get(self, keys: np.ndarray) -> np.ndarray:
        """Rows for keys (-1 = absent); vectorized batched probe."""
        out = np.full(keys.size, -1, np.int32)
        if not keys.size:
            return out
        slot = self._slots(keys)
        pending = np.arange(keys.size)
        cap = self._keys.size
        while pending.size:
            s = slot[pending]
            k_at = self._keys[s]
            hit = k_at == keys[pending]
            out[pending[hit]] = self._rows[s[hit]]
            miss_end = k_at == -1
            pending = pending[~hit & ~miss_end]
            slot[pending] = (slot[pending] + 1) % cap
        return out

    def upsert(self, keys: np.ndarray, next_row: int) -> np.ndarray:
        """Rows for keys, allocating bump-pointer rows for absent ones
        (duplicate keys in one batch share one row). Returns
        (rows, new_next_row)."""
        keys = np.asarray(keys, np.int64)
        rows = self.get(keys)
        fresh = rows < 0
        if fresh.any():
            uq = np.unique(keys[fresh])
            new_rows = (next_row + np.arange(uq.size)).astype(np.int32)
            self._insert(uq, new_rows)
            next_row += uq.size
            rows = self.get(keys)
        return rows, next_row


class HostSpillTier:
    def __init__(
        self,
        model,
        table_name: str,
        spill_watermark: float = 0.75,
        evict_frac: float = 0.5,
        resync_interval: int = 64,
    ):
        g, ti = model.ec._find_table(table_name)
        if not g.tables[ti].is_dynamic:
            raise ValueError(
                f"{table_name} is not a dynamic table — the host-spill tier "
                "needs the exact key store (max_vocabulary_size=-1)"
            )
        if f"{g.name}#keys" not in model.state["emb_tables"]:
            raise ValueError(f"{table_name}: dynamic key store missing")
        self.model = model
        self.table_name = table_name
        self.spill_watermark = float(spill_watermark)
        self.evict_frac = float(evict_frac)
        self.resync_interval = int(resync_interval)
        self.ev = g.ev_size
        self._host_values: Optional[np.ndarray] = None
        self._host_opt: Dict[str, np.ndarray] = {}
        self._host_map = _NpMap()
        self._host_next = 0
        # residency mirror: sorted resident keys + aligned last-use stamps
        self._resident = np.zeros(0, np.int64)
        self._lastuse = np.zeros(0, np.int64)
        self._clock = 0
        self._since_resync = 0
        # attach-time sync: the model may already hold a populated device
        # working set (e.g. the tier is added mid-training)
        self._mirror_resync()

    # ------------------------------------------------------------- helpers
    def _ec(self):
        return self.model.ec

    def _g_ti(self):
        return self._ec()._find_table(self.table_name)

    def _device_resident(self) -> np.ndarray:
        """Full device key-store readback — spill/resync only, NOT the
        steady-state path."""
        ec = self._ec()
        g, ti = self._g_ti()
        ks = ec._host_key_store(self.model.state["emb_tables"], g)
        _slots, live = ec._live_slots(ks, g, ti)
        return live

    def _mirror_resync(self):
        actual = np.unique(self._device_resident().astype(np.int64))
        # carry last-use stamps for keys that survive; new-to-mirror keys
        # get the current clock
        pos = np.searchsorted(self._resident, actual)
        pos = np.clip(pos, 0, max(self._resident.size - 1, 0))
        known = (
            self._resident[pos] == actual
            if self._resident.size
            else np.zeros(actual.size, bool)
        )
        stamps = np.full(actual.size, self._clock, np.int64)
        if self._resident.size:
            stamps[known] = self._lastuse[pos[known]]
        self._resident, self._lastuse = actual, stamps
        self._since_resync = 0

    def _mirror_touch(self, keys: np.ndarray):
        """Merge batch keys into the mirror with the current clock stamp."""
        self._clock += 1
        if not keys.size:
            return
        merged = np.union1d(self._resident, keys)
        stamps = np.full(merged.size, 0, np.int64)
        if self._resident.size:
            pos = np.searchsorted(merged, self._resident)
            stamps[pos] = self._lastuse
        pos_new = np.searchsorted(merged, keys)
        stamps[pos_new] = self._clock
        self._resident, self._lastuse = merged, stamps

    def _host_upsert(self, keys, vals, st: Dict[str, np.ndarray]) -> None:
        keys = np.asarray(keys, np.int64)
        if self._host_values is None:
            cap = max(1024, 2 * keys.size)
            self._host_values = np.zeros((cap, self.ev), np.float32)
            self._host_opt = {
                slot: np.zeros((cap, a.shape[1]), np.float32)
                for slot, a in st.items()
            }
        rows, self._host_next = self._host_map.upsert(keys, self._host_next)
        cap = self._host_values.shape[0]
        if self._host_next > cap:
            new_cap = max(2 * cap, self._host_next)
            self._host_values = np.resize(self._host_values, (new_cap, self.ev))
            self._host_values[cap:] = 0.0
            for slot in self._host_opt:
                w = self._host_opt[slot].shape[1]
                self._host_opt[slot] = np.resize(
                    self._host_opt[slot], (new_cap, w)
                )
                self._host_opt[slot][cap:] = 0.0
        self._host_values[rows] = vals
        for slot, a in st.items():
            self._host_opt[slot][rows] = a

    # ------------------------------------------------------------------ API
    def spill(
        self, evict_frac: Optional[float] = None, max_keep: Optional[int] = None
    ) -> int:
        """Flush every live device row to the host master, then evict the
        least-recently-used `evict_frac` of them from the device (HKV
        cold-bucket eviction analog). `max_keep` caps the surviving set so
        incoming fresh keys keep placement headroom (probe clustering makes
        inserts fail near full occupancy). Returns evicted count."""
        import jax
        import jax.numpy as jnp

        ec = self._ec()
        g, ti = self._g_ti()
        state = self.model.state
        frac = self.evict_frac if evict_frac is None else float(evict_frac)
        # key-store readback only ([rows] int32); values transfer ONLY for
        # the evicted subset via a device-side gather — flushing ALL live
        # rows would read the whole table+state back per spill, and the
        # master copy of a still-resident row is stale until its eviction
        # anyway (it keeps training on device)
        ks_host = ec._host_key_store(state["emb_tables"], g)
        slots, live = ec._live_slots(ks_host, g, ti)
        if not len(live):
            return 0
        # LRU pick: stamps via the mirror (unknown keys count as oldest)
        live64 = live.astype(np.int64)
        stamps = np.zeros(live64.size, np.int64)
        if self._resident.size:
            pos = np.clip(
                np.searchsorted(self._resident, live64),
                0,
                self._resident.size - 1,
            )
            hit = self._resident[pos] == live64
            stamps[hit] = self._lastuse[pos[hit]]
        n_evict = int(np.ceil(frac * live64.size))
        if max_keep is not None:
            n_evict = max(n_evict, live64.size - max(int(max_keep), 0))
        n_evict = min(n_evict, live64.size)
        order = np.argsort(stamps, kind="stable")[:n_evict]
        evict_keys = live[order]
        # pow2-pad the evicted set (repeated first key/slot — probe + clear
        # + upsert are idempotent under repeats) so the jitted gather/evict
        # programs compile once per bucket size, not per call
        evict_keys_p, slots_p = _pad_pow2([evict_keys, slots[order]])
        # ONE fused gather dispatch for table + every opt slot, then one
        # bulk device_get (serial per-array dispatches + transfers dominate
        # flush cost on dispatch-latency-bound hosts)
        opt_items = list(state["eopt"].get(g.name, {}).items())
        got = jax.device_get(
            ec._gather_rows_multi(
                [state["emb_tables"][g.name]] + [v for _k, v in opt_items],
                slots_p,
            )
        )
        vals = np.asarray(got[0], np.float32)
        st = {
            k: np.asarray(a, np.float32)
            for (k, _v), a in zip(opt_items, got[1:])
        }
        self._host_upsert(evict_keys_p, vals, st)
        state["emb_tables"], state["eopt"] = ec.evict(
            state["emb_tables"], state["eopt"], self.table_name, evict_keys_p
        )
        # survivor set is known exactly — no second readback needed
        mask = np.ones(live64.size, bool)
        mask[order] = False
        surv, surv_st = live64[mask], stamps[mask]
        o2 = np.argsort(surv)
        self._resident, self._lastuse = surv[o2], surv_st[o2]
        self._since_resync = 0
        return int(evict_keys.size)

    def stage_batch(self, keys: np.ndarray) -> int:
        """Bring host-master rows for this batch's keys into the device
        working set (LRU-spilling under watermark pressure). Call between
        steps with the batch's raw keys for this table's feature. Returns
        the number of rows staged. Steady-state cost: a few vector ops on
        the batch's unique keys — no device readback."""
        ec = self._ec()
        g, ti = self._g_ti()
        state = self.model.state
        keys = np.asarray(keys).reshape(-1)
        if getattr(self.model.solver, "i64_input_key", False):
            # the device key store and the spilled host master both hold
            # FOLDED int31 ids — fold raw i64 keys through the model's
            # exact assignment first (raw keys would silently miss, and a
            # later int32 cast would wrap)
            base = self.table_name.split("::", 1)[0]
            keys = self.model._i64_exact_fold(
                base, keys.astype(np.int64).reshape(-1, 1)
            ).reshape(-1)
        uniq = np.unique(keys[keys >= 0]).astype(np.int64)
        if not uniq.size:
            return 0
        if self._since_resync >= self.resync_interval:
            self._mirror_resync()
        self._since_resync += 1

        def plan():
            if self._resident.size:
                pos = np.clip(
                    np.searchsorted(self._resident, uniq),
                    0,
                    self._resident.size - 1,
                )
                nonres = self._resident[pos] != uniq
            else:
                nonres = np.ones(uniq.size, bool)
            cand = uniq[nonres]
            host_rows = self._host_map.get(cand)
            want = cand[host_rows >= 0]
            fresh = int((host_rows < 0).sum())
            return want, fresh

        want, fresh = plan()
        cap = int(g.table_vocab[ti])
        if self._resident.size + want.size + fresh > self.spill_watermark * cap:
            # keep enough free slots for the incoming keys (near-full
            # occupancy makes probed inserts fail)
            self.spill(
                max_keep=int(self.spill_watermark * cap)
                - (int(want.size) + fresh)
            )
            want, fresh = plan()
        if not want.size:
            self._mirror_touch(uniq)
            return 0
        from .collection import _fold_reserved_key

        tables = dict(state["emb_tables"])
        nks = np.array(ec._host_key_store(tables, g))
        placed = ec._host_insert_keys(nks, g, ti, want.astype(np.int32))
        if (placed < 0).any():
            # probe clustering: spill to free slots and retry once —
            # dropping a wanted key here would let insert-on-backward
            # recreate it as a fresh row, and the NEXT spill would then
            # overwrite the host master's trained row with that restart
            self.spill()
            want, fresh = plan()  # spilled batch keys rejoin `want`
            if not want.size:
                self._mirror_touch(uniq)
                return 0
            tables = dict(state["emb_tables"])
            nks = np.array(ec._host_key_store(tables, g))
            placed = ec._host_insert_keys(nks, g, ti, want.astype(np.int32))
            if (placed < 0).any():
                dropped = want[placed < 0]
                logger.warning(
                    f"host-spill: {dropped.size} key(s) unplaceable after "
                    f"spill (probe clustering, e.g. {dropped[:4].tolist()}): "
                    "their host-master rows will be RESTARTED by insert-on-"
                    "backward — raise dynamic_capacity"
                )
        rows = self._host_map.get(want)
        ok = (placed >= 0) & (rows >= 0)
        dst = placed[ok]
        if not len(dst):
            self._mirror_touch(uniq)
            return 0
        n_staged = int(ok.sum())
        vals = self._host_values[rows[ok]]
        store_vals = _fold_reserved_key(want.astype(np.int32)[ok])
        opt_vals = {
            slot: self._host_opt[slot][rows[ok]] for slot in self._host_opt
        }
        padded = _pad_pow2([dst, vals, store_vals, *opt_vals.values()])
        dst, vals, store_vals = padded[0], padded[1], padded[2]
        opt_vals = dict(zip(opt_vals, padded[3:]))
        # ONE fused dispatch for table + key store + every opt slot: serial
        # per-array dispatches dominate staging cost on dispatch-latency-
        # bound hosts (measured here: ~25 ms per RPC through the tunnel)
        ks_name = f"{g.name}#keys"
        opt_slots = [
            s for s in state["eopt"].get(g.name, {}) if s in opt_vals
        ]
        arrs = [tables[g.name], tables[ks_name]] + [
            state["eopt"][g.name][s] for s in opt_slots
        ]
        vals_list = [vals, store_vals] + [opt_vals[s] for s in opt_slots]
        outs = ec._scatter_all_replicas_multi(arrs, g, dst, vals_list)
        tables[g.name], tables[ks_name] = outs[0], outs[1]
        state["emb_tables"] = tables
        if opt_slots:
            eopt = dict(state["eopt"])
            eopt[g.name] = dict(eopt[g.name])
            for s, o in zip(opt_slots, outs[2:]):
                eopt[g.name][s] = o
            state["eopt"] = eopt
        self._mirror_touch(uniq)
        return n_staged

    @property
    def host_size(self) -> int:
        """Keys resident in the host master tier."""
        return int(self._host_map.size)

    def lookup_host(self, key: int) -> Optional[np.ndarray]:
        """Host-master row for a key (None if not spilled there)."""
        row = int(self._host_map.get(np.asarray([key], np.int64))[0])
        return None if row < 0 else self._host_values[row].copy()
