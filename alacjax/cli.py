"""alacconvert-compatible CLI (reference: convert-utility/main.cpp).

Usage:
    python -m alacjax.cli input.wav output.caf [options]
    python -m alacjax.cli input.caf output.wav [options]

Direction is inferred from the file extensions, exactly like the
reference's ``alacconvert``.
"""

from __future__ import annotations

import argparse
import sys

from .types import AlacError


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="alacconvert",
        description="Apple Lossless converter (TPU-native rebuild). "
                    "WAV->CAF encodes; CAF->WAV decodes.",
    )
    p.add_argument("input", help="input file (.wav or .caf)")
    p.add_argument("output", help="output file (.caf or .wav)")
    p.add_argument("--frame-size", type=int, default=4096, metavar="N",
                   help="samples per packet (default 4096)")
    p.add_argument("--fast", action="store_true",
                   help="fast mode: skip the encoder parameter search")
    p.add_argument("--independent-frames", action="store_true",
                   help="reset predictor state each packet "
                        "(enables packet-parallel encode)")
    p.add_argument("--backend", choices=("oracle", "jax"), default=None,
                   help="packet codec backend (default: jax if usable, "
                        "else oracle)")
    p.add_argument("--search", choices=("standard", "exhaustive"),
                   default="standard",
                   help="encoder parameter search: standard (dilated "
                        "mixres trial) or exhaustive (full-rate trials "
                        "over every mixres; best rate, host codec)")
    p.add_argument("--resume", action="store_true",
                   help="checkpointed encode: journal progress next to the "
                        "output and resume after interruption "
                        "(WAV->CAF only)")
    p.add_argument("--verbose", "-v", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    backend = args.backend
    if backend is None:
        try:
            from .convert import get_backend
            get_backend("jax")
            # importing jax is not enough — probe an actual device op
            # (backend init can fail at first compute, e.g. when no
            # accelerator is reachable)
            import jax.numpy as jnp
            int(jnp.zeros((1,), jnp.int32).sum())
            backend = "jax"
        except Exception:
            backend = "oracle"
    elif backend == "jax":
        try:
            import jax.numpy as jnp
            int(jnp.zeros((1,), jnp.int32).sum())
        except Exception as e:
            print(f"alacconvert: jax backend unavailable ({e}); "
                  "falling back to oracle", file=sys.stderr)
            backend = "oracle"

    import time

    from .convert import convert_file
    t0 = time.time()
    try:
        if args.resume and args.input.lower().endswith(".wav"):
            from . import checkpoint
            checkpoint.resumable_encode(
                args.input, args.output, frame_length=args.frame_size,
                backend=backend, fast_mode=args.fast)
            checkpoint.finalize(args.input, args.output, backend=backend)
        elif args.input.lower().endswith(".wav"):
            convert_file(
                args.input, args.output,
                frame_length=args.frame_size,
                fast_mode=args.fast,
                independent_frames=args.independent_frames,
                backend=backend,
                search=args.search,
            )
        else:
            convert_file(args.input, args.output, backend=backend)
    except AlacError as e:
        print(f"alacconvert: {e}", file=sys.stderr)
        return abs(e.status) % 256 or 1
    except OSError as e:
        print(f"alacconvert: {e}", file=sys.stderr)
        return 1
    if args.verbose:
        import os
        dt = time.time() - t0
        in_sz = os.path.getsize(args.input)
        out_sz = os.path.getsize(args.output)
        print(f"{args.input} ({in_sz}B) -> {args.output} ({out_sz}B) "
              f"ratio={out_sz / max(in_sz, 1):.3f} "
              f"[backend={backend}, {dt:.2f}s]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
