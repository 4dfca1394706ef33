"""Profiling / timing utilities — the TPU-idiomatic upgrade of the
reference's manual timing (SURVEY §5.1: AverageMeter brackets around
torch.cuda.synchronize, train_realBinaural.py:252-257; GPU memory printouts
:414-420).  Here: jax.profiler traces viewable in TensorBoard/XProf,
block_until_ready timing helpers, and device memory stats."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profile: ``with trace('/tmp/prof'): step()`` then view
    in TensorBoard's profile tab."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(out):
    """Force REAL completion by fetching a scalar per output leaf.

    block_until_ready() is not sufficient on tunneled/remote TPU backends —
    it can return before remote execution finishes, silently turning a
    benchmark into a dispatch-latency measurement (observed on axon)."""
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "sum"):
            float(jnp.sum(leaf))


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 10,
          **kwargs) -> Dict[str, float]:
    """Wall-clock a jitted function with host-fetch synchronisation —
    replaces the cuda.synchronize bracketing."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "per_sec": 1.0 / dt}


def device_memory_stats(device=None) -> Optional[Dict[str, float]]:
    """HBM usage (the MemoryStabilizer analogue — XLA owns HBM, so this is
    observability, not management)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {
        "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 1e9,
        "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 1e9,
        "bytes_limit_gb": stats.get("bytes_limit", 0) / 1e9,
    }


def hlo_cost_flops(fn: Callable, *args) -> float:
    """FLOPs of ``fn(*args)`` via XLA's HLO cost analysis on the
    UNOPTIMIZED module (host-side; no backend compile).

    Caveats: scan/while bodies are counted ONCE — pass scan-free programs
    (a single step, not a reps-scanned wrapper).  The axon tunnel client
    returns None from cost_analysis(), so on failure the lowering is
    retried against the CPU client from avals (device-free), with
    DIFFBINAURAL_PALLAS_INTERPRET=1 so the in-tree Pallas kernels trace
    as regular XLA ops the CPU pipeline can analyse (same matmul /
    elementwise dataflow, so the count stays representative).

    Raises RuntimeError when no client can analyse the module.

    Do not pass a fn object you will later execute under jit with the
    SAME avals: the interpret-mode trace made here is cached by (fn,
    avals) and would be reused by the real execution.  Pass a fresh
    lambda wrapper instead (all in-tree callers do).

    NOT safe concurrent with other tracing in the same process: the
    interpret gate is a process-global env var held for the duration of
    both lowering attempts, so any jit trace happening in that window
    would be traced (and cached) in interpret mode.  Fine for the
    single-threaded bench callers this serves.
    """
    import os

    avals = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            jax.numpy.shape(a), jax.numpy.result_type(a)),
        args)
    errors = []

    def attempt(backend):
        jf = jax.jit(fn) if backend is None else jax.jit(fn, backend=backend)
        try:
            cost = jf.lower(*avals).cost_analysis()
        except Exception as e:  # noqa: BLE001 — fall through to next client
            errors.append(f"{backend or 'default'}: {type(e).__name__}: {e}")
            return None
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else None
        if not cost:
            errors.append(f"{backend or 'default'}: cost_analysis() "
                          f"returned {cost!r}")
        return cost

    # Interpret mode must be on for BOTH attempts: jax's trace cache is
    # keyed on (fn, avals) but not backend, so a first non-interpret
    # trace would be reused by the CPU attempt and fail its lowering.
    # Save/restore a pre-existing user-set value instead of popping it
    # (ADVICE r4: popping silently reverted a user-forced interpret gate).
    prev = os.environ.get("DIFFBINAURAL_PALLAS_INTERPRET")
    os.environ["DIFFBINAURAL_PALLAS_INTERPRET"] = "1"
    try:
        cost = attempt(None) or attempt("cpu")
    finally:
        if prev is None:
            os.environ.pop("DIFFBINAURAL_PALLAS_INTERPRET", None)
        else:
            os.environ["DIFFBINAURAL_PALLAS_INTERPRET"] = prev
    if not cost:
        raise RuntimeError(
            "cost_analysis unavailable on every backend: "
            + "; ".join(errors))
    return float(cost.get("flops", 0.0))
