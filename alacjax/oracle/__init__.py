"""Scalar NumPy oracle — the executable specification of every codec stage.

Written straight from SURVEY.md §2 (reference: codec/matrix_{enc,dec}.c,
dp_{enc,dec}.c, ag_{enc,dec}.c, ALACEncoder.cpp, ALACDecoder.cpp).  This
package is deliberately naive and sequential: it defines the exact integer
semantics the JAX/Pallas device path must reproduce bit-for-bit, and serves
as the in-repo test oracle separating "vectorization bug" from "spec
misunderstanding" (SURVEY.md §4 item 5).

NOTE on provenance: /root/reference is an empty mount (SURVEY.md §0), so
details marked "VERIFY vs reference" define *our* ALAC dialect until the
reference source materializes; lossless round-trip is the correctness gate.
"""

from .matrix import mix, unmix, shift_off, shift_in
from .dp import init_coefs, pc_block, unpc_block
from .ag import AGParams, dyn_comp, dyn_decomp, set_standard_ag_params
from .encoder import ALACEncoder
from .decoder import ALACDecoder

__all__ = [
    "mix", "unmix", "shift_off", "shift_in",
    "init_coefs", "pc_block", "unpc_block",
    "AGParams", "dyn_comp", "dyn_decomp", "set_standard_ag_params",
    "ALACEncoder", "ALACDecoder",
]
