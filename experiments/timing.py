"""Tunnel-latency-free timing helpers for the axon TPU.

A single dispatch+readback through the tunnel costs ~29 ms, swamping any
per-op measurement. `op_time` times an in-graph fori_loop of n iterations
(data-dependent chain so XLA cannot collapse it) at two different n and
differences them, cancelling the fixed dispatch cost.
"""

import time

import jax
import jax.numpy as jnp


def _timed_call(fn, *args):
    t0 = time.perf_counter()
    r = fn(*args)
    # scalar readback is the only reliable synchronization under the tunnel
    float(jnp.asarray(r).ravel()[0])
    return time.perf_counter() - t0


def op_time(make_loop, n_lo=2, n_hi=12, reps=3, label=""):
    """make_loop(n) -> jitted zero-arg fn running the op n times chained.

    Returns seconds per op iteration.
    """
    f_lo = make_loop(n_lo)
    f_hi = make_loop(n_hi)
    _timed_call(f_lo)  # compile
    _timed_call(f_hi)
    t_lo = min(_timed_call(f_lo) for _ in range(reps))
    t_hi = min(_timed_call(f_hi) for _ in range(reps))
    per = (t_hi - t_lo) / (n_hi - n_lo)
    if label:
        print(f"{label:56s} {per * 1e3:9.3f} ms")
    return per


def chain_loop(op, x0, n):
    """Build a jitted fn running `op` n times with a data-dependent carry.

    op: f(x) -> y with y.shape arbitrary; the carry perturbs x0 by a scalar
    derived from y so each iteration depends on the previous one.

    NOTE: keep closure constants small — the axon remote-compile endpoint
    rejects HLO payloads with large embedded constants (HTTP 413). Prefer
    `keyed_loop` for ops over big operands.
    """

    def run():
        def body(_, x):
            y = op(x)
            s = jnp.asarray(y).ravel()[0] * 1e-20
            return x + s.astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x0)
        return x.ravel()[0]

    return jax.jit(run)


def keyed_loop(make_op, n):
    """Like chain_loop but generates operands INSIDE the graph.

    make_op: f(key) -> (x0, op) where generation runs once before the loop;
    its cost cancels in op_time's (n_hi - n_lo) difference. Keeps the HLO
    payload small for the axon remote-compile endpoint.
    """

    def run():
        x0, op = make_op(jax.random.PRNGKey(0))

        def body(_, x):
            y = op(x)
            s = jnp.asarray(y).ravel()[0] * 1e-20
            return x + s.astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x0)
        return x.ravel()[0]

    return jax.jit(run)
