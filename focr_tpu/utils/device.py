"""Device-side execution fencing.

``jax.block_until_ready`` is the documented way to wait for async dispatch,
but the tunneled remote backend this framework targets has been observed to
acknowledge enqueues before execution completes: a chain of 32 8192^3
matmuls "finished" in ~0 wall-clock (an impossible 49 PFLOP/s on a
197 TFLOP/s chip), while the same chain behind a data-dependent d2h fetch
read ~5.7 ms/matmul (~50% MFU). Anything that derives a *measurement* from
a wait must therefore fence with a real fetch; plain result consumers are
unaffected (``jax.device_get`` forces execution by construction).

The fence reduces ONE element of every leaf into a single device scalar
with ONE jitted dispatch and fetches THAT, so it costs one dispatch + one
d2h round trip (~30 ms on the tunnel) total, independent of leaf count.
The alternatives measured: a per-leaf scalar fetch pays ~1.5 ms/leaf on
top of the RTT, and an eagerly-built reduction pays ~1.5 ms per eager op —
both enough to distort per-page device metrics by ~1 ms/page at bench
scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def _tap_sum(leaves):
    taps = [a.ravel()[0].astype(jnp.float32) for a in leaves]
    return functools.reduce(lambda x, y: x + y, taps)


def force(outs) -> None:
    """Block until every leaf of ``outs`` has actually executed.

    block_until_ready first (correct and sufficient on well-behaved
    backends), then a single scalar fetch whose value data-depends on every
    leaf — the authoritative fence for backends that ack early, correct
    even if the backend executes out of order. (_tap_sum retraces per leaf
    signature; bench/measure call sites have stable signatures.)
    """
    leaves = jax.tree_util.tree_leaves(outs)
    jax.block_until_ready(leaves)
    if not leaves:
        return
    jax.device_get(_tap_sum(leaves))
