"""Device mesh + multi-host helpers.

The reference's only parallelism is a JVM thread pool fanning files out
(reference ``benchmark/.../AbstractMultiThreadedBenchmark.java:35-45``). The
TPU-native equivalent is data parallelism over a 1-D device mesh: corpus
shards per chip, vocab tables replicated, counts reduced with ``psum`` over
ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX distributed for a multi-host pod slice.

    No-op when running single-process (the common case in tests and on a
    single chip). On a pod slice, call once per host before building meshes;
    arguments may be omitted when the TPU runtime provides them.
    """
    if coordinator_address is None and num_processes is None:
        return  # single process; nothing to do
    # NOTE: must run before anything initializes the XLA backend — probing
    # jax.process_count() here would itself initialize it, so "already
    # initialized by the runtime" is detected from the error instead.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as err:
        if "once" in str(err):
            return  # already initialized by the runtime
        raise


def data_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))
