"""Shared interpret-mode gate for the Pallas TPU kernels.

The kernels run interpreted whenever the trace isn't targeting a real
TPU: CPU tests / virtual-device meshes (``jax.default_backend() !=
"tpu"``), or when ``DIFFBINAURAL_PALLAS_INTERPRET=1`` forces it.  The env
override exists for FLOP-accounting lowerings (bench.py / micro.py):
those lower against the CPU client while the process's default backend is
still the TPU tunnel, and a Mosaic ``pallas_call`` in the module would
make the CPU lowering (and its HLO cost analysis) fail.  Interpret mode
traces the same matmul/elementwise dataflow as regular XLA ops, so the
FLOP count stays representative.
"""

from __future__ import annotations

import os

import jax


def pallas_interpret() -> bool:
    return (
        os.environ.get("DIFFBINAURAL_PALLAS_INTERPRET") == "1"
        or jax.default_backend() != "tpu"
    )
