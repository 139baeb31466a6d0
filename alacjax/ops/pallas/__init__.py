"""Pallas TPU kernels for the hot recurrences.

The XLA scan formulation (ops/predict.py, ops/rice.py) is the default
compute path; these kernels are the hand-scheduled alternatives, selected
via ``alacjax.ops.pallas.enabled()`` (ALACJAX_PALLAS=1).  Each kernel is
bit-exact against the scalar oracle (tested in interpret mode on CPU and
compiled on TPU).
"""

import os


def enabled() -> bool:
    return os.environ.get("ALACJAX_PALLAS", "0") == "1"
