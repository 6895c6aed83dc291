"""Multi-host (DCN) mesh construction and distributed initialization.

The reference is single-GPU (SURVEY.md section 2.3: no distributed layer);
multi-host scaling is north-star scope (BASELINE config #5). The model:

  - A **host-factored mesh**: the leading axis crosses hosts (its
    collectives ride DCN), trailing axes stay inside a host (ICI).
  - Route **data parallelism** over the host axis — one gradient
    all-reduce per step is the only DCN traffic — or **ring sequence
    parallelism** (parallel/ring.py) — a ring laid over hosts crosses DCN
    on exactly 2 host-boundary hops per rotation regardless of host
    count, and the ppermute is issued a step early so DCN latency hides
    behind the per-shard kernel.
  - Keep **tensor parallelism** (per-layer collectives) on the ICI axis.

Under `jax.distributed` every process runs this same program; the mesh
spans all processes' devices and XLA partitions collectives across
DCN/ICI automatically from the device topology.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Sequence[int] | None = None,
) -> None:
    """Initialize the JAX distributed runtime for a multi-host run.

    No-op when the runtime is already initialized or when running
    single-process (num_processes in (None, 0, 1) and no coordinator).
    Call before any other JAX API on every host, e.g.:

        initialize_distributed("10.0.0.1:8476", num_processes=2,
                               process_id=int(os.environ["HOST_ID"]))
    """
    if coordinator_address is None and (num_processes or 1) <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def host_device_mesh(
    axis_names: Sequence[str] = ("data", "model"),
    *,
    devices: Sequence[jax.Device] | None = None,
    num_hosts: int | None = None,
    chip_factors: Sequence[int] | None = None,
) -> Mesh:
    """Build a host-factored mesh: axis 0 = hosts (DCN), rest = chips (ICI).

    Real multi-host: leave ``devices`` unset — jax.devices() is grouped by
    ``process_index`` so mesh rows align with physical hosts (each row's
    collectives stay on that host's ICI).

    Virtual testing (single process, e.g. the CPU
    ``xla_force_host_platform_device_count`` mesh): pass ``devices`` and
    ``num_hosts`` to emulate the host factorization.

    ``chip_factors`` further factors the per-host chip dimension, e.g.
    ``axis_names=("data", "seq", "model"), chip_factors=(2, 2)`` gives a
    (hosts, 2, 2) mesh for host-DP x ring-SP x head-TP.
    """
    if devices is None:
        devices = jax.devices()
        if num_hosts is None:
            num_hosts = jax.process_count()
        by_proc: dict[int, list[jax.Device]] = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        if len(by_proc) == num_hosts and num_hosts > 1:
            rows = [by_proc[i] for i in sorted(by_proc)]
            sizes = {len(r) for r in rows}
            assert len(sizes) == 1, "hosts with unequal chip counts"
            arr = np.array(rows)
        else:
            arr = np.array(devices).reshape(num_hosts, -1)
    else:
        assert num_hosts is not None and num_hosts >= 1
        arr = np.array(devices).reshape(num_hosts, -1)

    if chip_factors is not None:
        arr = arr.reshape(arr.shape[0], *chip_factors)
        assert len(axis_names) == 1 + len(chip_factors), (
            axis_names, chip_factors)
    else:
        assert len(axis_names) == 2, axis_names
    return Mesh(arr, tuple(axis_names))
