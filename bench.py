#!/usr/bin/env python
"""Benchmark: batched encode+decode throughput on one chip.

Primary metric (BASELINE.json): encode+decode frames/sec/chip on 16-bit
44.1 kHz stereo, 4096-sample frames.  Prints ONE JSON line.

vs_baseline: the reference (Apple ALAC C, single core) publishes no
numbers and /root/reference is an empty mount (SURVEY.md §0/§6), so the
denominator is MEASURED live from this repo's own native C++ host codec
(alacjax/native) running the identical algorithm single-core on this
machine — a reference-class C baseline producing byte-identical packets.
Falls back to a documented estimate if no compiler is present.
"""

import json
import sys
import time

import numpy as np

BASELINE_FRAMES_PER_SEC_EST = 2000.0  # fallback only (no compiler)


def measure_native_baseline(pcm: np.ndarray, config) -> tuple[float, str]:
    """Single-core C++ enc+dec frames/s on a slice of the bench corpus."""
    try:
        from alacjax import native
        if not native.available():
            raise RuntimeError(native.build_error() or "unavailable")
        nf = min(32, pcm.shape[0])
        dec = native.NativeDecoder(config)
        native.NativeEncoder(config).encode_packet(pcm[0])  # warm
        best = None
        deadline = time.time() + 3.0  # best-of over a fixed window:
        while True:  # shields the denominator from scheduling noise
            # fresh encoder per pass: identical work every repetition
            # (persistent coef banks would otherwise warm across passes)
            enc = native.NativeEncoder(config)
            t0 = time.time()
            pkts = [enc.encode_packet(pcm[i]) for i in range(nf)]
            for p in pkts:
                dec.decode_packet(p)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            if time.time() >= deadline:
                break
        return nf / best, "measured: this repo's native C++ single-core codec"
    except Exception as e:  # no compiler / build failure
        return BASELINE_FRAMES_PER_SEC_EST, f"estimate (native unavailable: {e})"


def make_music(nf: int, S: int, seed: int = 7) -> np.ndarray:
    """Synthetic stereo 'music': chords + vibrato + noise floor, int16."""
    rng = np.random.default_rng(seed)
    n = nf * S
    t = np.arange(n) / 44100.0
    sig = (8000 * np.sin(2 * np.pi * 440 * t)
           + 4000 * np.sin(2 * np.pi * 554.4 * t + 0.3)
           + 2000 * np.sin(2 * np.pi * 220 * t * (1 + 0.001 * np.sin(2 * np.pi * 5 * t)))
           + 120 * rng.standard_normal(n))
    left = np.clip(sig, -32768, 32767).astype(np.int32)
    right = np.clip(np.roll(sig, 23) * 0.92, -32768, 32767).astype(np.int32)
    pcm = np.stack([left, right]).reshape(2, nf, S)
    return np.transpose(pcm, (1, 0, 2)).copy()  # (nf, 2, S)


def require_backend(max_tries: int = 9, wait_s: float = 45.0) -> None:
    """Fail-soft against transient TPU-tunnel outages: probe the backend
    and, if it is unavailable (observed live: axon init hangs or raises
    UNAVAILABLE for minutes at a time), re-exec this process after a
    pause.  A failed backend init poisons jax's in-process plugin state,
    so retrying requires a fresh process, not a fresh call."""
    import os
    tries = int(os.environ.get("ALACJAX_BENCH_TRIES", "0"))
    import multiprocessing as mp
    # probe in a child so a HANGING init (not just a raising one) is
    # also caught; the child shares nothing with this process's jax
    proc = mp.get_context("spawn").Process(
        target=_probe_backend_child, daemon=True)
    proc.start()
    proc.join(timeout=90.0)
    ok = proc.exitcode == 0
    if proc.is_alive():
        proc.terminate()
        proc.join()
    if ok:
        return
    if tries + 1 >= max_tries:
        print(json.dumps({"metric": "backend unavailable",
                          "value": 0, "unit": "frames/s",
                          "vs_baseline": 0,
                          "detail": {"error": "TPU backend unavailable "
                                     f"after {max_tries} probes"}}))
        sys.exit(1)
    os.environ["ALACJAX_BENCH_TRIES"] = str(tries + 1)
    sys.stderr.write(f"[bench] backend unavailable (probe {tries + 1}/"
                     f"{max_tries}); retrying in {wait_s:.0f}s\n")
    time.sleep(wait_s)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def _probe_backend_child() -> None:
    import jax
    jax.devices()


def measure_host_serdes(B: int, num_words: int) -> float:
    """Host serdes rate (words -> bytes -> words), measured BEFORE the
    device backend exists: once the accelerator client is up, its
    tunnel/poll threads contend with pure-python loops on a small host
    (measured 17x degradation on this 1-core box — VERDICT r4 item 4a's
    5,135 f/s was that contention, not the serializer).  Shape-accurate
    synthetic data: the cost is bytes copied + per-frame slicing, not
    content."""
    from alacjax.ops import bitpack as _bp  # imports jax, no backend init
    rng = np.random.default_rng(0)
    wh = rng.integers(0, 2 ** 32, (B, num_words), dtype=np.uint32)
    bh = np.minimum((np.full(B, 0.67 * 32 * num_words)).astype(np.int64),
                    32 * num_words).astype(np.int32)
    best = None
    for _ in range(3):
        t0 = time.time()
        pk = _bp.words_to_bytes(wh, bh)
        _bp.bytes_to_words(pk, num_words)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return B / best


def main() -> int:
    import os
    # ALACJAX_BENCH_PLATFORM=cpu: run the bench pipeline on the host CPU
    # (with XLA_FLAGS=--xla_force_host_platform_device_count=N for a
    # simulated mesh).  Needed because this box's sitecustomize pins
    # JAX_PLATFORMS=axon before user code runs — only the config update
    # below overrides it (see tests/conftest.py).
    force_platform = os.environ.get("ALACJAX_BENCH_PLATFORM")
    if not force_platform:
        require_backend()
    import jax
    if force_platform:
        jax.config.update("jax_platforms", force_platform)

    # Persistent compilation cache: TPU compiles of the full pipeline are
    # slow (and the remote-compile service occasionally stalls); caching
    # makes reruns start in seconds.
    import os
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache EVERYTHING: the encode program's XLA compile is ~3.5 s,
        # UNDER the old 5 s threshold, so it was silently re-compiled on
        # every bench run (the ~6 s encode_compile_s readings were that,
        # not cache-hit cost)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from alacjax.codec import get_codec
    from alacjax.types import AlacConfig

    S = 4096
    # --devices N (or ALACJAX_BENCH_DEVICES): run the SAME measurement
    # through an N-device frames mesh (VERDICT r4 item 8).  N=1 builds a
    # real 1-device Mesh (not the meshless fast path), so the number
    # proves the sharding machinery itself adds no overhead; on real
    # multi-chip hardware the scaling number is this flag.
    n_devices = int(os.environ.get("ALACJAX_BENCH_DEVICES", "0"))
    argv = list(sys.argv[1:])
    if "--devices" in argv:
        i = argv.index("--devices")
        n_devices = int(argv[i + 1])
        del argv[i:i + 2]
    argv = [a for a in argv if not a.startswith("--")]
    B = int(argv[0]) if len(argv) > 0 else 4096
    iters = int(argv[1]) if len(argv) > 1 else 6

    # ALACJAX_BENCH_SEARCH=exhaustive prices the full device candidate
    # grid (A/B knob; the headline stays the standard reference dialect)
    config = AlacConfig(bit_depth=16, num_channels=2, frame_length=S,
                        sample_rate=44100,
                        search=os.environ.get("ALACJAX_BENCH_SEARCH",
                                              "standard"))
    # serdes must be measured while the host is quiet — before the
    # device client's threads exist (see measure_host_serdes)
    serdes_fps = measure_host_serdes(
        B, (config.max_escape_packet_bytes(S) + 3) // 4 + 2)
    if n_devices >= 1:
        from jax.sharding import Mesh
        from alacjax.codec import FRAMES_AXIS, JaxCodec
        devs = jax.devices()
        if n_devices > len(devs):
            raise SystemExit(f"--devices {n_devices}: only {len(devs)} "
                             "visible (use JAX_PLATFORMS=cpu XLA_FLAGS="
                             "--xla_force_host_platform_device_count=N "
                             "for the CPU-sim mesh)")
        mesh = Mesh(np.asarray(devs[:n_devices]), (FRAMES_AXIS,))
        codec = JaxCodec(config, chunk=B, mesh=mesh)
    else:
        codec = get_codec(config, chunk=B)

    pcm = make_music(B, S)
    x = jnp.asarray(pcm)

    # warmup / compile
    t0 = time.time()
    words, bits = codec._encode(x)
    words.block_until_ready()
    enc_compile = time.time() - t0
    t0 = time.time()
    decoded, err, _ = codec._decode(words)
    decoded.block_until_ready()
    dec_compile = time.time() - t0

    # correctness gate inside the bench: lossless or the number is void
    assert not np.asarray(err).any(), "decode error flags set"
    assert (np.asarray(decoded) == pcm).all(), "round-trip not lossless"

    # steady state
    t0 = time.time()
    for _ in range(iters):
        w, b = codec._encode(x)
        d, e, _n = codec._decode(w)
    d.block_until_ready()
    dt = time.time() - t0

    fps = B * iters / dt

    # end-to-end: encode_frames -> list[bytes] -> decode_frames, i.e. the
    # REAL host API with packet serialization/deserialization and
    # host<->device transfers included.  A sub-batch chunk gives the
    # pipelined chunk loop (codec.py) work to overlap: chunk k's host
    # serialization rides under chunk k+1's device compute.
    #
    # Provenance caveat, measured (see d2h_MBps below): on this dev box
    # the chip is reached over the axon TUNNEL at ~30-80 MB/s, so the
    # end-to-end number here is transfer-bound, not codec-bound (the
    # packet+PCM traffic of the device rate needs ~1 GB/s, trivial for a
    # production PCIe/ICI host, impossible for the tunnel).  The
    # host-serdes-only rate (host_serdes_frames_per_sec) is the
    # environment-independent half of the pipelining claim.
    e2e_codec = get_codec(config, chunk=min(B, 1024))
    pkts = e2e_codec.encode_frames(pcm)          # warm / compile
    out = e2e_codec.decode_frames(pkts)
    assert (out == pcm).all(), "end-to-end round-trip not lossless"
    e2e_iters = 2
    t0 = time.time()
    for _ in range(e2e_iters):
        pkts = e2e_codec.encode_frames(pcm)
        out = e2e_codec.decode_frames(pkts)
    e2e_dt = time.time() - t0
    e2e_fps = B * e2e_iters / e2e_dt

    # (host serdes was measured pre-backend — see measure_host_serdes)
    bh = np.asarray(bits)

    # link transfer rates (the e2e bottleneck on this tunnel-attached
    # box).  XOR on device forces a FRESH buffer — re-fetching `words`
    # would be served from its already-materialized host copy.
    fresh = (words ^ jnp.uint32(1))
    fresh.block_until_ready()
    t0 = time.time()
    np.asarray(fresh)
    d2h_mbps = fresh.nbytes / 1e6 / (time.time() - t0)
    t0 = time.time()
    jnp.asarray(pcm ^ 1).block_until_ready()
    h2d_mbps = pcm.nbytes / 1e6 / (time.time() - t0)

    # transfer-adjusted end-to-end bound (VERDICT r4 item 4b): device
    # compute + the batch's real host<->device traffic at the MEASURED
    # link rate, labeled with the link.  On this box the link is the
    # axon tunnel (tens of MB/s); on a production PCIe/ICI host the same
    # formula with its measured rate recovers ~the device rate.  The raw
    # tunnel-bound loop measurement stays as end_to_end_frames_per_sec
    # for provenance.
    packet_bytes = float(np.sum((bh + 7) // 8))
    down = pcm.nbytes + packet_bytes      # PCM in, packets back in
    up = packet_bytes + pcm.nbytes        # packets out, decoded PCM out
    xfer_s = down / (h2d_mbps * 1e6) + up / (d2h_mbps * 1e6)
    e2e_adj_fps = B / (dt / iters + xfer_s)

    baseline_fps, baseline_src = measure_native_baseline(pcm, config)
    comp_ratio = float(np.sum((np.asarray(bits) + 7) // 8)) / pcm.nbytes * 2
    result = {
        "metric": "encode+decode frames/sec/chip (16-bit stereo 44.1kHz, 4096-sample frames)",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "detail": {
            "batch_frames": B,
            "iters": iters,
            "seconds": round(dt, 3),
            "audio_seconds_per_second": round(fps * S / 44100.0, 1),
            "compression_ratio": round(comp_ratio, 3),
            "encode_compile_s": round(enc_compile, 1),
            "decode_compile_s": round(dec_compile, 1),
            "end_to_end_frames_per_sec": round(e2e_fps, 1),
            "end_to_end_fraction": round(e2e_fps / fps, 3),
            "e2e_transfer_adjusted_frames_per_sec": round(e2e_adj_fps, 1),
            "e2e_link": "axon tunnel (dev box); substitute a production "
                        "link's measured rate for its bound",
            "host_serdes_frames_per_sec": round(serdes_fps, 1),
            "host_serdes_note": "measured pre-backend on a quiet host "
                                "(shape-accurate synthetic batch)",
            "d2h_MBps": round(d2h_mbps, 1),
            "h2d_MBps": round(h2d_mbps, 1),
            "mesh_devices": n_devices if n_devices >= 1 else None,
            "device": str(jax.devices()[0]),
            "baseline_frames_per_sec": round(baseline_fps, 1),
            "baseline_note": baseline_src,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
