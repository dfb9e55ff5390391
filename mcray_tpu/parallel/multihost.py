"""Multi-host (pod-slice) initialisation and mesh construction.

The reference has no distributed path at all (SURVEY.md §2.3). The TPU-native
design scales across hosts with jax.distributed over DCN for control and XLA
collectives over ICI for data: after ``initialize()``, every host sees the
global device set and the same ``shard_map`` code from parallel/shard.py runs
unchanged — scanlines sharded over all chips, the ~1 MB RF all_gather and the
(M, 8) material-gradient psum riding ICI within a slice.

Cannot be exercised on a single-host image; validated structurally via the
virtual-device mesh tests and the driver's dryrun_multichip.
"""

from __future__ import annotations

import jax

from .shard import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Fail-fast jax.distributed init (no-op on single process).

    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "rays"):
    """1-D mesh over every chip in the slice (all hosts)."""
    return make_mesh(axis=axis)


def is_primary() -> bool:
    return jax.process_index() == 0
