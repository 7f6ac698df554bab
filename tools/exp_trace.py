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
    # Each rep's op is a distinct HLO instance (name, name.1, name.2, ...):
    # aggregate by base name and divide by reps for the true per-call cost.
    agg = {}
    for ms, name, src in rows:
        base = name.rsplit(".", 1)
        base = base[0] if len(base) == 2 and base[1].rstrip(
            "clone.0123456789") == "" else name
        agg[base] = agg.get(base, 0.0) + ms
    for base, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        if ms / reps < 0.02:
            continue
        print(f"{ms / reps:8.3f} ms/call  {base[:72]}")
    return rows


def run_traced_each(named_fns, args, reps=6, logdir="/tmp/exp_trace"):
    """Trace each fn in its OWN program; report total device ms per call.

    Unlike run_traced, anonymous XLA fusions are attributable: everything in
    variant X's trace belongs to X. Cost: one compile + trace per variant.
    """
    import shutil

    rs = jnp.arange(reps, dtype=jnp.int32)
    results = []
    for name, fn in named_fns:
        @jax.jit
        def program(rs, *a, _fn=fn):
            outs = []
            for r in range(reps):
                outs.append(
                    jax.tree_util.tree_leaves(_fn(rs[r], *a))[0][:8, :1])
            return jnp.concatenate([o.astype(jnp.float32).reshape(-1)
                                    for o in outs])

        np.asarray(program(rs, *args))
        ld = f"{logdir}_{name}"
        shutil.rmtree(ld, ignore_errors=True)
        with trace(ld):
            np.asarray(program(rs, *args))
        rows = summarize_device_trace(ld)
        tot = sum(ms for ms, _, _ in rows) / reps
        results.append((name, tot, rows))
        print(f"{tot:8.3f} ms/call  {name}")
    return results
