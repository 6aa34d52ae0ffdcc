"""Host-spill tier for EBC dynamic tables (HierarchicalKV analog).

The reference serves beyond-HBM vocabularies with a host-memory tier under
the device table (SOK HierarchicalKV backend, sparse_operation_kit
hkv lineage; EmbeddingTrainingCache's staged host parameter server,
include/embedding_training_cache/embedding_training_cache.hpp:26-70).

TPU analog: the model's dynamic table (exact probed key store, fixed
``dynamic_capacity`` device working set) is backed by a growing HOST master
(numpy arrays + an exact key->row dict). ``stage_batch(keys)`` runs
host-side BETWEEN steps (shapes are static under jit, so tier migration
cannot happen inside the compiled step — same reasoning as
``grow_dynamic_capacity``): resident keys pass through, host-master keys
are inserted into the device store with their values + optimizer state,
and when the working set would cross the spill watermark the whole set is
flushed to the host master first (HKV device-cache eviction analog).
Unknown keys stay untouched — the engine's insert-on-backward creates them
on the device, and the next spill adopts them into the master.

The per-batch automatic counterpart of EmbeddingTrainingCache's explicit
pass staging; both are exact.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.logger import get_logger

logger = get_logger()


class HostSpillTier:
    def __init__(self, model, table_name: str, spill_watermark: float = 0.75):
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
        self.ev = g.ev_size
        self._host_values: Optional[np.ndarray] = None
        self._host_opt: Dict[str, np.ndarray] = {}
        self._host_index: Dict[int, int] = {}
        self._host_next = 0

    # ------------------------------------------------------------- helpers
    def _ec(self):
        return self.model.ec

    def _g_ti(self):
        return self._ec()._find_table(self.table_name)

    def _device_resident(self) -> np.ndarray:
        ec = self._ec()
        g, ti = self._g_ti()
        ks = ec._host_key_store(self.model.state["emb_tables"], g)
        lo = int(g.local_offsets[ti])
        rows_t = int(g.rows_per_shard[ti])
        f = g.num_shards if g.is_model_parallel else 1
        segs = []
        for shard in range(f):
            base = shard * g.total_local_rows if g.is_model_parallel else 0
            seg = ks[base + lo : base + lo + rows_t]
            segs.append(seg[seg != int(ec.EMPTY_KEY)])
        return np.concatenate(segs) if segs else np.zeros(0, np.int32)

    def _host_upsert(self, keys, vals, st: Dict[str, np.ndarray]) -> None:
        if self._host_values is None:
            cap = max(1024, 2 * len(keys))
            self._host_values = np.zeros((cap, self.ev), np.float32)
            self._host_opt = {
                slot: np.zeros((cap, a.shape[1]), np.float32)
                for slot, a in st.items()
            }
        need_fresh = sum(1 for k in keys if int(k) not in self._host_index)
        cap = self._host_values.shape[0]
        if self._host_next + need_fresh > cap:
            new_cap = max(2 * cap, self._host_next + need_fresh)
            self._host_values = np.resize(self._host_values, (new_cap, self.ev))
            self._host_values[cap:] = 0.0
            for slot in self._host_opt:
                w = self._host_opt[slot].shape[1]
                self._host_opt[slot] = np.resize(
                    self._host_opt[slot], (new_cap, w)
                )
                self._host_opt[slot][cap:] = 0.0
        for i, k in enumerate(np.asarray(keys).tolist()):
            k = int(k)
            row = self._host_index.get(k)
            if row is None:
                # host-master rows are never freed (spill moves keys host-
                # ward only; the master is append-only like the SOK hkv
                # twin's steady state), so allocation is a bump pointer
                row = self._host_next
                self._host_next += 1
                self._host_index[k] = row
            self._host_values[row] = vals[i]
            for slot, a in st.items():
                self._host_opt[slot][row] = a[i]

    # ------------------------------------------------------------------ API
    def spill(self) -> None:
        """Flush the whole device working set to the host master and clear
        it (device-cache eviction)."""
        ec = self._ec()
        g, ti = self._g_ti()
        state = self.model.state
        live, vals, st = ec._collect_dynamic_entries(
            state["emb_tables"], state["eopt"], g, ti
        )
        if len(live):
            self._host_upsert(live, np.asarray(vals, np.float32),
                              {k: np.asarray(v, np.float32) for k, v in st.items()})
            state["emb_tables"], state["eopt"] = ec.evict(
                state["emb_tables"], state["eopt"], self.table_name, live
            )

    def stage_batch(self, keys: np.ndarray) -> int:
        """Bring host-master rows for this batch's keys into the device
        working set (spilling first under watermark pressure). Call between
        steps with the batch's raw keys for this table's feature. Returns
        the number of rows staged."""
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
        uniq = [int(k) for k in np.unique(keys[keys >= 0]).tolist()]

        def plan():
            resident = set(self._device_resident().tolist())
            want, fresh = [], 0
            for k in uniq:
                if k in resident:
                    continue
                if k in self._host_index:
                    want.append(k)
                else:
                    fresh += 1  # insert-on-backward creates it; needs room
            return resident, want, fresh

        resident, want, fresh = plan()
        cap = int(g.table_vocab[ti])
        if len(resident) + len(want) + fresh > self.spill_watermark * cap:
            self.spill()
            resident, want, fresh = plan()
        if not want:
            return 0
        from .collection import _fold_reserved_key

        tables = dict(state["emb_tables"])
        nks = np.array(ec._host_key_store(tables, g))
        placed = ec._host_insert_keys(nks, g, ti, np.asarray(want))
        if (placed < 0).any():
            # probe clustering: spill to free slots and retry once —
            # dropping a wanted key here would let insert-on-backward
            # recreate it as a fresh row, and the NEXT spill would then
            # overwrite the host master's trained row with that restart
            self.spill()
            _res, want, _fresh = plan()  # spilled batch keys rejoin `want`
            if not want:
                return 0
            tables = dict(state["emb_tables"])
            nks = np.array(ec._host_key_store(tables, g))
            placed = ec._host_insert_keys(nks, g, ti, np.asarray(want))
            if (placed < 0).any():
                dropped = [k for k, p in zip(want, placed) if p < 0]
                logger.warning(
                    f"host-spill: {len(dropped)} key(s) unplaceable after "
                    f"spill (probe clustering, e.g. {dropped[:4]}): their "
                    "host-master rows will be RESTARTED by insert-on-"
                    "backward — raise dynamic_capacity"
                )
        rows = np.asarray([self._host_index[k] for k in want])
        vals = self._host_values[rows]
        ok = placed >= 0
        dst = placed[ok]
        if not len(dst):
            return 0
        tables[g.name] = ec._scatter_all_replicas(tables[g.name], g, dst, vals[ok])
        ks_name = f"{g.name}#keys"
        tables[ks_name] = ec._scatter_all_replicas(
            tables[ks_name], g, dst,
            _fold_reserved_key(np.asarray(want, np.int32)[ok]),
        )
        state["emb_tables"] = tables
        eopt = dict(state["eopt"])
        for slot in eopt.get(g.name, {}):
            eopt[g.name] = dict(eopt[g.name])
            eopt[g.name][slot] = ec._scatter_all_replicas(
                eopt[g.name][slot], g, dst, self._host_opt[slot][rows][ok]
            )
        state["eopt"] = eopt
        return int(ok.sum())

    @property
    def host_size(self) -> int:
        """Keys resident in the host master tier."""
        return len(self._host_index)

    def lookup_host(self, key: int) -> Optional[np.ndarray]:
        """Host-master row for a key (None if not spilled there)."""
        row = self._host_index.get(int(key))
        return None if row is None else self._host_values[row].copy()
