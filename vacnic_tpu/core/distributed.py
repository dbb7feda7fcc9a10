"""Multi-host initialization and cross-host utilities.

The reference's process bootstrap is `dist.init_process_group("nccl")` driven
by torchrun's LOCAL_RANK (train...match.py:616-629). The TPU-native
equivalent: `jax.distributed.initialize()` on each host (coordinator discovery
via TPU metadata or explicit args), after which `jax.devices()` spans the
slice and the same pjit programs scale — collectives ride ICI within a slice
and DCN across slices with no further code changes (SURVEY §2.9).
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Multi-host init. MUST run before anything touches a JAX backend
    (even `jax.process_count()` initializes it, after which distributed init
    is ineffective). Raises on real failures rather than silently falling
    back to single-process training with no cross-host gradient sync."""
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address, num_processes, process_id)
        else:
            jax.distributed.initialize()  # TPU metadata discovery
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise
    except ValueError:
        # no coordinator discoverable → genuinely single-process environment
        if num_processes not in (None, 1):
            raise


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs
    (the reference gates on LOCAL_RANK==0 implicitly via torchrun)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """Each host feeds its shard of the global batch (DistributedSampler
    equivalent, train...match.py:775)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
