#!/usr/bin/env python
"""Reference-parity suite (SURVEY.md §4 item 4) — ready to FIRE the
moment /root/reference materializes.

The mount has been empty every session (SURVEY §0 standing order:
re-check first thing).  This harness is the prepared response: given a
populated reference drop it

  1. builds the reference ``alacconvert`` (make if a makefile exists,
     else a direct g++ sweep over convert-utility/ + codec/ sources),
  2. generates the BASELINE.json config corpus (depths x layouts x
     content classes, tail-bearing lengths),
  3. asserts (a) our encoder's packets are byte-identical to the
     reference encoder's per config, (b) both decoders accept the other
     side's streams losslessly, and
  4. prints one JSON line: the bit-exact parity rate (BASELINE.json
     target: 100%) plus per-file diagnostics for any divergence (first
     differing packet index / byte offset — the ⚠ VERIFY items in
     SURVEY §2 name where to look first).

Because the real binary is absent, ``--self-test`` swaps in THIS repo's
CLI as the "reference binary" so the harness logic itself stays tested
(corpus, conversion driving, packet diffing, report) — the only
untested seam is the reference build itself, which cannot be tested
until the mount fills.

Usage:
  python tools_reference_parity.py              # real reference (or SKIP)
  python tools_reference_parity.py --self-test  # harness self-check
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))  # script lives in tools/
REF = "/root/reference"
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# reference build
# ---------------------------------------------------------------------------
def build_reference(ref_dir: str, out_dir: str) -> str:
    """Build the reference alacconvert; returns the binary path."""
    # 1) any makefile near a convert-utility main
    mains = []
    for root, _dirs, files in os.walk(ref_dir):
        for f in files:
            if f.lower() in ("makefile", "gnumakefile"):
                mains.append(("make", root))
    for kind, root in mains:
        r = subprocess.run(["make", "-C", root, "-j1"],
                           capture_output=True, text=True, timeout=600)
        if r.returncode == 0:
            for broot, _d, bfiles in os.walk(ref_dir):
                for f in bfiles:
                    p = os.path.join(broot, f)
                    if f == "alacconvert" and os.access(p, os.X_OK):
                        return p
    # 2) direct g++ sweep: every .c/.cpp under codec/ + convert-utility/
    srcs, incs = [], set()
    for root, _dirs, files in os.walk(ref_dir):
        for f in files:
            if f.endswith((".c", ".cpp")):
                srcs.append(os.path.join(root, f))
            if f.endswith(".h"):
                incs.add(root)
    if not srcs:
        raise RuntimeError("no C/C++ sources found under the mount")
    binp = os.path.join(out_dir, "alacconvert")
    cmd = (["g++", "-O2", "-fwrapv", "-o", binp]
           + srcs + [f"-I{i}" for i in sorted(incs)])
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        raise RuntimeError(f"reference build failed:\n{r.stderr[-4000:]}")
    return binp


# ---------------------------------------------------------------------------
# corpus (BASELINE.json configs x content classes, tail-bearing lengths)
# ---------------------------------------------------------------------------
CONFIGS = [  # (name, depth, channels)
    ("stereo16", 16, 2),
    ("mono16", 16, 1),
    ("hires24", 24, 2),
    ("surround51", 16, 6),
    ("escape32", 32, 2),
]
CONTENT = ["sine", "noise", "silence", "impulse"]
S = 4096
N = 3 * S + 1234  # tail-bearing


def gen_pcm(kind: str, nch: int, n: int, depth: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    full = 1 << (depth - 1)
    if kind == "noise":
        return rng.integers(-full, full, (nch, n))
    if kind == "sine":
        t = np.arange(n)
        base = (np.sin(t * 0.01)[None, :] * (full // 4)
                + np.sin(t * 0.1)[None, :] * 200).astype(np.int64)
        return np.clip(base + rng.integers(-3, 4, (nch, n)), -full, full - 1)
    if kind == "silence":
        return np.zeros((nch, n), dtype=np.int64)
    x = np.zeros((nch, n), dtype=np.int64)
    x[:, ::211] = full - 1
    x[:, 7::401] = -full
    return x


def write_corpus(d: str) -> list[dict]:
    from alacjax.containers.pcm import pack_pcm
    from alacjax.containers.wav import WavFile, write_wav
    items = []
    for name, depth, nch in CONFIGS:
        for kind in CONTENT:
            pcm = gen_pcm(kind, nch, N, depth, seed=hash((name, kind)) & 0xFFFF)
            path = os.path.join(d, f"{name}_{kind}.wav")
            write_wav(WavFile(44100, depth, nch, pack_pcm(pcm, depth)), path)
            items.append(dict(name=f"{name}_{kind}", wav=path, pcm=pcm,
                              depth=depth, nch=nch))
    return items


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------
def run_ref(binp: str, inp: str, outp: str) -> None:
    r = subprocess.run([binp, inp, outp], capture_output=True, text=True,
                       timeout=600)
    if r.returncode != 0:
        raise RuntimeError(f"{binp} {inp} -> {outp} rc={r.returncode}: "
                           f"{r.stderr[-500:]}")


def ours_encode(wav_path: str, caf_path: str) -> None:
    """Parity mode: persistent coefficient banks (the reference encoder
    keeps mCoefsU/V across packets), strongest host codec available."""
    from alacjax.convert import convert_file
    convert_file(wav_path, caf_path, backend="oracle")


def ours_decode(caf_path: str, wav_path: str) -> None:
    from alacjax.convert import convert_file
    convert_file(caf_path, wav_path, backend="oracle")


def packets_of(caf_path: str):
    from alacjax.containers.caf import read_caf
    return read_caf(caf_path)


def first_packet_diff(a: list[bytes], b: list[bytes]):
    for i, (pa, pb) in enumerate(zip(a, b)):
        if pa != pb:
            off = next(j for j, (x, y) in enumerate(zip(pa, pb)) if x != y) \
                if min(len(pa), len(pb)) else 0
            return dict(packet=i, byte=off, ours=len(pa), ref=len(pb))
    if len(a) != len(b):
        return dict(packet=min(len(a), len(b)), byte=-1,
                    ours=len(a), ref=len(b))
    return None


def main() -> int:
    self_test = "--self-test" in sys.argv
    ref_files = os.listdir(REF) if os.path.isdir(REF) else []
    if not ref_files and not self_test:
        print(json.dumps({"metric": "reference parity", "status": "SKIP",
                          "reason": "/root/reference is an empty mount"}))
        return 0

    work = tempfile.mkdtemp(prefix="refparity_")
    try:
        if self_test:
            # stand-in "reference": this repo's own CLI, oracle backend —
            # exercises every harness path except the reference build
            def ref_conv(inp, outp):
                from alacjax.cli import main as cli
                rc = cli([inp, outp, "--backend", "oracle"])
                if rc:
                    raise RuntimeError(f"self-test ref rc={rc}")
        else:
            binp = build_reference(REF, work)

            def ref_conv(inp, outp):
                run_ref(binp, inp, outp)

        from alacjax.containers.pcm import unpack_pcm
        from alacjax.containers.wav import read_wav

        items = write_corpus(work)
        results, n_exact = [], 0
        for it in items:
            row = dict(name=it["name"])
            # (a) encode parity: packets byte-identical
            ours_caf = os.path.join(work, it["name"] + ".ours.caf")
            ref_caf = os.path.join(work, it["name"] + ".ref.caf")
            ours_encode(it["wav"], ours_caf)
            ref_conv(it["wav"], ref_caf)
            oc, rc_ = packets_of(ours_caf), packets_of(ref_caf)
            diff = first_packet_diff(oc.packets, rc_.packets)
            row["encode_parity"] = diff is None
            if diff:
                row["first_diff"] = diff
            else:
                n_exact += 1
            # (b) cross-decode: ref stream -> our decoder
            ref_wav = os.path.join(work, it["name"] + ".refdec.wav")
            ours_decode(ref_caf, ref_wav)
            w = read_wav(ref_wav)
            got = unpack_pcm(w.data, w.bit_depth, w.num_channels)
            row["ours_decodes_ref"] = bool((got == it["pcm"]).all())
            # (b') our stream -> ref decoder
            our_wav = os.path.join(work, it["name"] + ".oursdec.wav")
            ref_conv(ours_caf, our_wav)
            w = read_wav(our_wav)
            got = unpack_pcm(w.data, w.bit_depth, w.num_channels)
            row["ref_decodes_ours"] = bool((got == it["pcm"]).all())
            results.append(row)

        rate = n_exact / len(items)
        ok_cross = all(r["ours_decodes_ref"] and r["ref_decodes_ours"]
                       for r in results)
        print(json.dumps({
            "metric": "bit-exact parity rate vs reference",
            "value": round(rate, 4), "unit": "fraction (target 1.0)",
            "cross_decode_lossless": ok_cross,
            "mode": "self-test" if self_test else "reference",
            "files": len(items),
            "divergent": [r for r in results
                          if not (r["encode_parity"]
                                  and r["ours_decodes_ref"]
                                  and r["ref_decodes_ours"])],
        }))
        return 0 if (rate == 1.0 and ok_cross) else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
