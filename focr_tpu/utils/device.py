"""Device-side execution fencing.

``jax.block_until_ready`` is the documented way to wait for async dispatch,
but the tunneled remote backend this framework targets has been observed to
acknowledge enqueues before execution completes: a chain of 32 8192^3
matmuls "finished" in ~0 wall-clock (an impossible 49 PFLOP/s on a
197 TFLOP/s chip), while the same chain behind a data-dependent d2h fetch
read ~5.7 ms/matmul (~50% MFU). Anything that derives a *measurement* from
a wait must therefore fence with a real fetch; plain result consumers are
unaffected (``jax.device_get`` forces execution by construction).

The fence fetches ONE scalar slice per output leaf, collected by a single
``device_get`` (which issues all async copies before blocking), so it costs
roughly one transport round trip regardless of how many computations are
queued.
"""

from __future__ import annotations

import jax


def force(outs) -> None:
    """Block until every leaf of ``outs`` has actually executed.

    block_until_ready first (correct and sufficient on well-behaved
    backends), then a data-dependent scalar fetch per leaf as the
    authoritative fence for backends that ack early.
    """
    leaves = jax.tree_util.tree_leaves(outs)
    jax.block_until_ready(leaves)
    jax.device_get([a.ravel()[:1] for a in leaves])
