"""Multi-host bootstrap + data-parallel batch driver.

The reference is strictly single-process (SURVEY §2.3).  Here:

  * ``initialize_multihost`` wraps ``jax.distributed.initialize`` (DCN
    rendezvous) — on a v5p pod slice every host calls it before touching
    devices; single-host calls are no-ops.
  * ``BatchTranscriber`` streams utterance windows through a data-parallel
    decode in lockstep: each host ingests its own audio shard, windows are
    batched to the global batch size, and per-utterance seek state advances
    independently (the reference's one-window-at-a-time loop,
    transcribe.rs:151-234, generalized to a batch).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bootstrap JAX's distributed runtime when running multi-host.

    No-op when single-process (num_processes in {None, 1} and no
    coordinator configured via env).
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        n = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("JAX_PROCESS_ID")
        process_id = int(p) if p else None

    if coordinator_address is None or not num_processes or num_processes == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
