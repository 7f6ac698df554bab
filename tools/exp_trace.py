"""Trace-based kernel experiments: run variants inside one jitted program and
read exact device durations from the profiler (deterministic on TPU, immune
to tunnel dispatch overhead and contention gaps).

Usage: python tools/exp_trace.py
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.utils.profiling import trace, summarize_device_trace


def run_traced(named_fns, args, reps=6, logdir="/tmp/exp_trace"):
    """named_fns: [(name, fn)]; each fn(*args) -> arrays. Executes all fns
    reps times inside jit under a trace; prints per-fn device ms."""
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)

    wrapped = []
    for name, fn in named_fns:
        # Name the pallas kernel via a scope so the trace row is attributable.
        wrapped.append((name, jax.named_scope(name)(fn)))

    rs = jnp.arange(reps, dtype=jnp.int32)

    @jax.jit
    def program(rs, *a):
        outs = []
        for name, fn in wrapped:
            for r in range(reps):
                # fn receives a TRACED rep index: variants mix it into an
                # input (e.g. counts + (r >> 30)) so XLA cannot CSE the reps.
                outs.append(jax.tree_util.tree_leaves(fn(rs[r], *a))[0][:8, :1])
        return jnp.concatenate([o.astype(jnp.float32).reshape(-1)
                                for o in outs])

    out = program(rs, *args)
    np.asarray(out)
    with trace(logdir):
        np.asarray(program(rs, *args))
    rows = summarize_device_trace(logdir)
    for ms, name, src in rows:
        if ms / reps < 0.05:
            continue
        print(f"{ms / reps:8.3f} ms  {name[:72]}")
    return rows
