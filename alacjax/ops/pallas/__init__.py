"""Pallas TPU kernels for the hot recurrences.

STATUS (round-2 decision, VERDICT r01 item 5): PARKED as a validated
reference, not part of the perf story.  Rationale:

* Round-1 measured the Mosaic predictor kernel at parity with the XLA
  scan on v5e — both are latency-bound on the serial per-sample
  dependency chain, so hand scheduling the same recurrence buys nothing.
* The round-2 production encode path made the standalone kernel
  structurally obsolete: the predictor scan now ALSO carries two
  adaptive-Rice cost machines (ops/predict.py :: pc_block_cost2) and
  runs the entire (order x stage x channel x element) candidate grid in
  one stacked scan — enabling ALACJAX_PALLAS=1 today *disables* that
  fusion and splits the search back into separate scans (slower by
  construction; bench: 11.4k -> ~8k frames/s headline).
* The decode side's fused Rice+FIR scan (ops/fused_decode.py) subsumed
  the decode-kernel idea the same way.

The kernel remains bit-exact against the scalar oracle (tested in
interpret mode on CPU and compiled on TPU) and is kept as the Mosaic
toolchain vehicle for any future hand-kernel work.

Selected via ``alacjax.ops.pallas.enabled()`` (ALACJAX_PALLAS=1).
"""

import os


def enabled() -> bool:
    return os.environ.get("ALACJAX_PALLAS", "0") == "1"
