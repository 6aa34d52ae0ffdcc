"""Embedding training cache: host-memory staged training of huge tables.

Analog of the reference EmbeddingTrainingCache (include/
embedding_training_cache/embedding_training_cache.hpp:26-70 — TrainPSType_t
Staged/Cached host parameter server): master embedding tables live in HOST
memory (bigger than device HBM); each training "pass" stages the pass's
keyset into a fixed-capacity device table, remaps batch keys to staged slots
(the KeysPreprocessStrategy::AddOffset / KeysToIndices analog done host-side),
trains, then flushes updated rows back to the host master.

Usage:
    etc = EmbeddingTrainingCache(model, "table0", host_values, host_opt)
    for pass_data in passes:
        keyset = unique_keys(pass_data)
        etc.update(keyset)          # stage rows to device
        ...train on remapped data (etc.map_keys per batch)...
        etc.flush()                 # write trained rows back to host
    etc.dump("path.npy")
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.logger import get_logger

logger = get_logger()


class EmbeddingTrainingCache:
    def __init__(
        self,
        model,
        table_name: str,
        host_values: np.ndarray,
        host_opt_state: Optional[Dict[str, np.ndarray]] = None,
    ):
        """Args:
        model: compiled Model whose EC contains `table_name` with a
          max_vocabulary_size = staging CAPACITY (max keys per pass).
        host_values: [V_huge, ev] host master table (may be np.memmap).
        host_opt_state: optional {slot: [V_huge, ev]} host optimizer state.
        """
        self.model = model
        self.table_name = table_name
        self.host = host_values
        self.host_opt = host_opt_state or {}
        g, ti = model.ec._find_table(table_name)
        self.capacity = int(g.table_vocab[ti])
        self.ev = g.ev_size
        if host_values.shape[1] != self.ev:
            raise ValueError(
                f"host table ev {host_values.shape[1]} != device ev {self.ev}"
            )
        self._keyset: Optional[np.ndarray] = None  # sorted staged keys

    # ------------------------------------------------------------------ API
    def update(self, keyset: np.ndarray) -> None:
        """Stage `keyset` rows host->device (reference: ETC::update)."""
        keys = np.unique(np.asarray(keyset).ravel())
        keys = keys[(keys >= 0) & (keys < self.host.shape[0])]
        if len(keys) > self.capacity:
            raise ValueError(
                f"pass keyset size {len(keys)} exceeds staging capacity "
                f"{self.capacity} — raise max_vocabulary_size or split passes"
            )
        if self._keyset is not None:
            self.flush()
        staged = np.zeros((self.capacity, self.ev), self.host.dtype)
        staged[: len(keys)] = self.host[keys]
        self.model.state["emb_tables"] = self.model.ec.import_table(
            self.model.state["emb_tables"], self.table_name, staged
        )
        # stage optimizer state alongside the rows
        for slot, arr in self.host_opt.items():
            st = self.model.state["eopt"]
            gname = self._gname()
            if slot in st.get(gname, {}):
                staged_s = np.zeros((self.capacity, self.ev), arr.dtype)
                staged_s[: len(keys)] = arr[keys]
                dev = np.asarray(st[gname][slot])
                rows = self.model.ec._table_storage_rows(
                    *self.model.ec._find_table(self.table_name), self.capacity
                )
                dev[rows] = staged_s
                import jax
                import jax.numpy as jnp

                st[gname][slot] = jax.device_put(
                    jnp.asarray(dev), st[gname][slot].sharding
                )
        self._keyset = keys
        logger.info(
            f"ETC staged {len(keys)} rows of {self.table_name} "
            f"(capacity {self.capacity})"
        )

    def map_keys(self, raw_keys: np.ndarray) -> np.ndarray:
        """Global keys -> staged slot ids; unknown keys -> -1 (padding).
        The KeysToIndices analog (reference:
        embedding/operators/keys_to_indices.cu) applied host-side."""
        if self._keyset is None:
            raise RuntimeError("call update(keyset) first")
        pos = np.searchsorted(self._keyset, raw_keys)
        pos_c = np.clip(pos, 0, len(self._keyset) - 1)
        hit = self._keyset[pos_c] == raw_keys
        return np.where(hit & (raw_keys >= 0), pos_c, -1).astype(raw_keys.dtype)

    def flush(self) -> None:
        """Write trained staged rows back to the host master
        (reference: ETC dump-to-PS between passes)."""
        if self._keyset is None:
            return
        staged = self.model.ec.export_table(
            self.model.state["emb_tables"], self.table_name
        )
        self.host[self._keyset] = staged[: len(self._keyset)]
        for slot, arr in self.host_opt.items():
            gname = self._gname()
            st = self.model.state["eopt"].get(gname, {})
            if slot in st:
                dev = np.asarray(st[slot])
                rows = self.model.ec._table_storage_rows(
                    *self.model.ec._find_table(self.table_name), self.capacity
                )
                arr[self._keyset] = dev[rows][: len(self._keyset)]

    def get_incremental_model(self) -> Dict[str, np.ndarray]:
        """Rows touched by the current pass (reference:
        ETC::get_incremental_model)."""
        self.flush()
        if self._keyset is None:
            return {"keys": np.zeros(0, np.int64), "values": np.zeros((0, self.ev))}
        return {"keys": self._keyset, "values": self.host[self._keyset]}

    def dump(self, path: str) -> None:
        self.flush()
        np.save(path, self.host)

    def _gname(self) -> str:
        g, _ = self.model.ec._find_table(self.table_name)
        return g.name
