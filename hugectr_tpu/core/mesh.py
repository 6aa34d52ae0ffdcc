"""Device mesh / resource management.

TPU-native analog of HugeCTR's ResourceManager (reference:
HugeCTR/src/resource_managers/resource_manager_core.cpp): instead of per-GPU
NCCL communicators and stream pools, we build a ``jax.sharding.Mesh`` and let
XLA own scheduling and collectives.

The canonical mesh for CTR training is 1-D ``("data",)``: dense layers are
data-parallel over it and model-parallel embedding shards ride the same axis
(HugeCTR likewise shards embeddings over all GPUs of the data-parallel group).
A 2-D ``("data", "ev")`` mesh is supported for column-wise embedding sharding
(reference: split_column_wise_sharding_config,
HugeCTR/src/embeddings/embedding_collection.cpp:25-130).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EV_AXIS = "ev"
DCN_AXIS = "dcn"  # inter-slice axis of a hierarchical (multi-slice) mesh
ICI_AXIS = "ici"  # intra-slice axis


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh request."""

    num_devices: int = 0  # 0 = all visible devices
    ev_parallelism: int = 1  # column-wise embedding sharding factor


class ResourceManager:
    """Owns the device mesh and canonical shardings.

    HugeCTR's ResourceManager creates NCCL comms, stream pools and device maps
    per GPU; on TPU the mesh + NamedShardings carry all of that information and
    XLA inserts the collectives.
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    @classmethod
    def create(
        cls,
        num_devices: int = 0,
        ev_parallelism: int = 1,
        num_slices: int = 1,
        devices: Optional[Sequence[jax.Device]] = None,
    ) -> "ResourceManager":
        """Build the mesh.

        num_slices > 1 requests a hierarchical 2-D ("dcn", "ici") mesh for
        multi-slice topologies (slow DCN between slices, fast ICI within) —
        the TPU analog of the reference's multi-node NVLink-island layout
        (hier_model_parallel_embedding.cpp). Batch and MP rows shard over
        BOTH axes; the embedding engine can decompose its collectives
        slice-first (CommunicationStrategy.Hierarchical)."""
        if devices is None:
            devices = jax.devices()
        if num_devices <= 0:
            num_devices = len(devices)
        devices = list(devices)[:num_devices]
        if ev_parallelism > 1 and num_slices > 1:
            raise ValueError("ev_parallelism and num_slices are exclusive")
        if ev_parallelism > 1:
            if num_devices % ev_parallelism:
                raise ValueError(
                    f"num_devices={num_devices} not divisible by "
                    f"ev_parallelism={ev_parallelism}"
                )
            dev_array = np.asarray(devices).reshape(
                num_devices // ev_parallelism, ev_parallelism
            )
            mesh = Mesh(dev_array, (DATA_AXIS, EV_AXIS))
        elif num_slices > 1:
            if num_devices % num_slices:
                raise ValueError(
                    f"num_devices={num_devices} not divisible by "
                    f"num_slices={num_slices}"
                )
            dev_array = np.asarray(devices).reshape(
                num_slices, num_devices // num_slices
            )
            mesh = Mesh(dev_array, (DCN_AXIS, ICI_AXIS))
        else:
            mesh = Mesh(np.asarray(devices), (DATA_AXIS,))
        return cls(mesh)

    # ---- mesh facts -------------------------------------------------------
    @property
    def num_devices(self) -> int:
        return self.mesh.size

    @property
    def is_hierarchical(self) -> bool:
        return DCN_AXIS in self.mesh.shape

    @property
    def data_axes(self):
        """Mesh axis name(s) carrying the batch dimension: "data" on a flat
        mesh, ("dcn", "ici") on a hierarchical one."""
        if self.is_hierarchical:
            return (DCN_AXIS, ICI_AXIS)
        return DATA_AXIS

    @property
    def num_slices(self) -> int:
        return self.mesh.shape.get(DCN_AXIS, 1)

    @property
    def slice_size(self) -> int:
        return self.mesh.shape.get(ICI_AXIS, self.data_parallel_size)

    @property
    def data_parallel_size(self) -> int:
        if self.is_hierarchical:
            return self.mesh.shape[DCN_AXIS] * self.mesh.shape[ICI_AXIS]
        return self.mesh.shape[DATA_AXIS]

    @property
    def ev_parallel_size(self) -> int:
        return self.mesh.shape.get(EV_AXIS, 1)

    @property
    def num_processes(self) -> int:
        """Distinct processes SPANNED BY THIS MESH (not the global job):
        a process-local mesh inside a multi-process job behaves
        single-controller."""
        return len({d.process_index for d in self.mesh.devices.flat})

    @property
    def process_index(self) -> int:
        """Rank of the CURRENT process within the processes spanned by this
        mesh (0 when the mesh is process-local)."""
        spanned = sorted({d.process_index for d in self.mesh.devices.flat})
        me = jax.process_index()
        return spanned.index(me) if me in spanned else 0

    def is_master_process(self) -> bool:
        spanned = sorted({d.process_index for d in self.mesh.devices.flat})
        return jax.process_index() == spanned[0]

    # ---- canonical shardings ---------------------------------------------
    def sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    def batch_sharding(self) -> NamedSharding:
        """Batch-dim sharded over the data axis (activations, inputs)."""
        return self.sharding(P(self.data_axes))

    def replicated_sharding(self) -> NamedSharding:
        return self.sharding(P())

    def row_sharding(self) -> NamedSharding:
        """Row-sharded over the data axis (MP embedding shards)."""
        return self.sharding(P(self.data_axes, None))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (reference analog: MpiInitService +
    ResourceManager multi-node NCCL setup, core23/mpi_init_service.cpp).
    Wraps jax.distributed.initialize; with no args, autodetects from the
    cluster environment (TPU pod metadata / env vars)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


_default_rm: Optional[ResourceManager] = None


def default_resource_manager() -> ResourceManager:
    global _default_rm
    if _default_rm is None:
        _default_rm = ResourceManager.create()
    return _default_rm


def set_default_resource_manager(rm: ResourceManager) -> None:
    global _default_rm
    _default_rm = rm
