"""Encoder orchestration oracle (reference: codec/ALACEncoder.{h,cpp};
SURVEY.md §2 row 10, §3.1).

Operates on *planar int arrays of right-aligned signed samples at
bit_depth* (container code handles wire PCM).  Produces one self-contained
ALAC packet per call, bit-compatible with our decoder's element grammar:

  per element: 3b tag | 4b instance | 12b unused(0) | 1b partialFrame
               | 2b bytesShifted | 1b escapeFlag
  partial  -> 32b numSamples
  !escape  -> (CPE) 8b mixBits + 8b mixRes;
              per channel: 8b (mode<<4|denShift), 8b (pbFactor<<5|num),
              num x 16b coefs;
              raw shifted-off low bytes (interleaved per sample/channel);
              Rice residual stream per channel (U then V)
  escape   -> raw samples at bit_depth (CPE: interleaved L,R)
  final    -> 3b ID_END, byte-align with zeros

Search policy (our dialect — the reference's dilated trial search is
⚠ VERIFY per SURVEY.md §0): mixres ∈ 0..4 (CPE) is chosen by a cheap
deterministic first-difference proxy (see mixres_proxy_cost: uint32-
wrapped sum of |Δ|>>4 over both mixed channels; argmin, first wins
ties — identical in oracle/native/device so packets stay byte-equal),
then an exact trial encode over order ∈ {4, 8} picks the cheaper; cost =
exact element bits, first minimum wins.  fast_mode uses (mixres=2,
order=8) with no search.  Escape when best compressed size >= escape
size.  Encoder coefficient banks persist across packets per
(channel, order) unless independent_frames.
"""

from __future__ import annotations

import numpy as np

from ..bitbuffer import BitBuffer
from ..cookie import serialize_cookie
from ..types import (
    DENSHIFT_DEFAULT, ElementTag, AlacConfig, AlacParamError, sign_extend,
)
from . import ag, dp, matrix

# dialect constants (ALACEncoder.cpp defaults)
DEFAULT_MIX_BITS = 2
MAX_RES = 4
SEARCH_ORDERS = (4, 8)
FAST_ORDER = 8
FAST_MIX_RES = 2
PB_FACTOR = 4


PROXY_SHIFT = 4


def mixres_proxy_cost(u: np.ndarray, v: np.ndarray) -> int:
    """Deterministic stereo-mode selection proxy: uint32-wrapped sum of
    first-difference magnitudes (>> PROXY_SHIFT) over both channels.

    A cheap order-1 predictability estimate (the FLAC-style heuristic);
    uint32 wraparound keeps it exactly reproducible across the python /
    C++ / JAX implementations for any frame length.
    """
    du = np.abs(np.diff(np.asarray(u, dtype=np.int64))) >> PROXY_SHIFT
    dv = np.abs(np.diff(np.asarray(v, dtype=np.int64))) >> PROXY_SHIFT
    return int((int(du.sum()) + int(dv.sum())) & 0xFFFFFFFF)


def bytes_shifted_for_depth(bit_depth: int) -> int:
    """Low-byte shift-off per depth (ALACEncoder.cpp :: EncodeStereo):
    32-bit -> 2 bytes, 24-bit -> 1, else 0."""
    if bit_depth == 32:
        return 2
    if bit_depth == 24:
        return 1
    return 0


def _write_element_header(bits: BitBuffer, tag: ElementTag, instance: int,
                          partial: bool, bytes_shifted: int, escape: bool,
                          num_samples: int) -> None:
    bits.write(int(tag), 3)
    bits.write(instance, 4)
    bits.write(0, 12)
    bits.write(1 if partial else 0, 1)
    bits.write(bytes_shifted, 2)
    bits.write(1 if escape else 0, 1)
    if partial:
        bits.write(num_samples, 32)


def _write_channel_params(bits: BitBuffer, mode: int, denshift: int,
                          pb_factor: int, coefs: np.ndarray, order: int) -> None:
    bits.write((mode << 4) | denshift, 8)
    bits.write((pb_factor << 5) | order, 8)
    for k in range(order):
        bits.write(int(coefs[k]) & 0xFFFF, 16)


def _rice_params(config: AlacConfig, num_samples: int, pb_factor: int) -> ag.AGParams:
    return ag.set_ag_params(
        config.mb, (config.pb * pb_factor) // 4, config.kb,
        num_samples, num_samples, config.max_run)


class ALACEncoder:
    """Stateful packet encoder mirroring the reference class surface."""

    def __init__(self, config: AlacConfig, independent_frames: bool = False):
        self.config = config
        self.independent_frames = independent_frames
        # persistent coef banks: {(channel_index, order): coefs}
        self._coef_banks: dict[tuple[int, int], np.ndarray] = {}
        # stats (ALACEncoder members mTotalBytesGenerated etc.)
        self.total_bytes_generated = 0
        self.max_frame_bytes = 0
        self.frames_encoded = 0

    # -- public API --------------------------------------------------------
    def get_magic_cookie(self) -> bytes:
        cfg = self.config
        avg_bit_rate = 0
        if self.frames_encoded:
            total_samples = self.frames_encoded  # sample-frames encoded
            if total_samples:
                avg_bit_rate = int(
                    self.total_bytes_generated * 8 * cfg.sample_rate // total_samples)
        import dataclasses
        cfg_out = dataclasses.replace(
            cfg, max_frame_bytes=self.max_frame_bytes, avg_bit_rate=avg_bit_rate)
        return serialize_cookie(cfg_out)

    def encode_packet(self, pcm: np.ndarray) -> bytes:
        """Encode one packet of planar samples (num_channels, num_samples)."""
        pcm = np.asarray(pcm, dtype=np.int64)
        if pcm.ndim != 2 or pcm.shape[0] != self.config.num_channels:
            raise AlacParamError(f"expected ({self.config.num_channels}, n) planar pcm")
        num_samples = pcm.shape[1]
        if num_samples > self.config.frame_length or num_samples <= 0:
            raise AlacParamError("bad packet length")

        bits = BitBuffer(byte_size=self.config.max_escape_packet_bytes(num_samples))
        partial = num_samples != self.config.frame_length

        ch = 0
        tag_counters: dict[int, int] = {}
        for tag, width in self.config.elements:
            instance = tag_counters.get(int(tag), 0)
            tag_counters[int(tag)] = instance + 1
            if width == 2:
                self._encode_cpe(bits, tag, instance, pcm[ch], pcm[ch + 1],
                                 num_samples, partial, ch)
            else:
                self._encode_sce(bits, tag, instance, pcm[ch], num_samples,
                                 partial, ch)
            ch += width

        bits.write(int(ElementTag.END), 3)
        bits.byte_align(add_zeros=True)
        out = bits.to_bytes()

        self.total_bytes_generated += len(out)
        self.max_frame_bytes = max(self.max_frame_bytes, len(out))
        self.frames_encoded += num_samples
        return out

    # -- coef banks --------------------------------------------------------
    def _bank(self, channel: int, order: int) -> np.ndarray:
        key = (channel, order)
        if self.independent_frames or key not in self._coef_banks:
            self._coef_banks[key] = dp.init_coefs(DENSHIFT_DEFAULT)
        return self._coef_banks[key]

    # -- CPE ---------------------------------------------------------------
    def _encode_cpe(self, bits: BitBuffer, tag: ElementTag, instance: int,
                    left: np.ndarray, right: np.ndarray, num_samples: int,
                    partial: bool, ch_index: int) -> None:
        cfg = self.config
        bs = bytes_shifted_for_depth(cfg.bit_depth)
        chanbits = cfg.bit_depth - 8 * bs + 1
        mixbits = DEFAULT_MIX_BITS

        l_hi, l_lo = matrix.shift_off(left, bs)
        r_hi, r_lo = matrix.shift_off(right, bs)

        if cfg.fast_mode:
            candidates = [(FAST_MIX_RES, FAST_ORDER)]
        else:
            # stereo mode by deterministic proxy, then exact order search
            best_mr, best_proxy = 0, None
            for mr in range(MAX_RES + 1):
                u, v = matrix.mix(l_hi, r_hi, mixbits, mr)
                p = mixres_proxy_cost(u, v)
                if best_proxy is None or p < best_proxy:
                    best_mr, best_proxy = mr, p
            candidates = [(best_mr, od) for od in SEARCH_ORDERS]

        best = None  # (bits_cost, trial_bits, mixres, order, coefsU_final, coefsV_final)
        for mixres, order in candidates:
            u, v = matrix.mix(l_hi, r_hi, mixbits, mixres)
            cu = dp.copy_coefs(self._bank(ch_index, order))
            cv = dp.copy_coefs(self._bank(ch_index + 1, order))
            cu0, cv0 = cu.copy(), cv.copy()
            trial = BitBuffer(byte_size=cfg.max_escape_packet_bytes(num_samples))
            _write_channel_params(trial, 0, DENSHIFT_DEFAULT, PB_FACTOR, cu0, order)
            _write_channel_params(trial, 0, DENSHIFT_DEFAULT, PB_FACTOR, cv0, order)
            if bs:
                for j in range(num_samples):
                    trial.write(int(l_lo[j]), bs * 8)
                    trial.write(int(r_lo[j]), bs * 8)
            res_u = dp.pc_block(u, cu, order, chanbits, DENSHIFT_DEFAULT)
            ag.dyn_comp(_rice_params(cfg, num_samples, PB_FACTOR), trial,
                        res_u, num_samples, chanbits)
            res_v = dp.pc_block(v, cv, order, chanbits, DENSHIFT_DEFAULT)
            ag.dyn_comp(_rice_params(cfg, num_samples, PB_FACTOR), trial,
                        res_v, num_samples, chanbits)
            cost = 16 + trial.get_position()  # + mixBits/mixRes fields
            if best is None or cost < best[0]:
                best = (cost, trial, mixres, order, cu, cv)

        escape_bits = num_samples * cfg.bit_depth * 2
        # element headers are identical in both forms, so compare bodies
        if best[0] >= escape_bits:
            # escape frame: raw interleaved PCM at full depth
            _write_element_header(bits, tag, instance, partial, 0, True, num_samples)
            for j in range(num_samples):
                bits.write(int(left[j]) & ((1 << cfg.bit_depth) - 1), cfg.bit_depth)
                bits.write(int(right[j]) & ((1 << cfg.bit_depth) - 1), cfg.bit_depth)
            return

        cost, trial, mixres, order, cu, cv = best
        # commit winning coef adaptation to the persistent banks
        self._coef_banks[(ch_index, order)] = cu
        self._coef_banks[(ch_index + 1, order)] = cv

        _write_element_header(bits, tag, instance, partial, bs, False, num_samples)
        bits.write(mixbits, 8)
        bits.write(mixres, 8)
        # splice the trial body (channel params + shift bytes + rice streams)
        _append_bits(bits, trial)

    # -- SCE / LFE ---------------------------------------------------------
    def _encode_sce(self, bits: BitBuffer, tag: ElementTag, instance: int,
                    samples: np.ndarray, num_samples: int, partial: bool,
                    ch_index: int) -> None:
        cfg = self.config
        bs = bytes_shifted_for_depth(cfg.bit_depth)
        chanbits = cfg.bit_depth - 8 * bs
        s_hi, s_lo = matrix.shift_off(samples, bs)

        orders = (FAST_ORDER,) if cfg.fast_mode else SEARCH_ORDERS
        best = None
        for order in orders:
            cu = dp.copy_coefs(self._bank(ch_index, order))
            cu0 = cu.copy()
            trial = BitBuffer(byte_size=cfg.max_escape_packet_bytes(num_samples))
            _write_channel_params(trial, 0, DENSHIFT_DEFAULT, PB_FACTOR, cu0, order)
            if bs:
                for j in range(num_samples):
                    trial.write(int(s_lo[j]), bs * 8)
            res = dp.pc_block(s_hi, cu, order, chanbits, DENSHIFT_DEFAULT)
            ag.dyn_comp(_rice_params(cfg, num_samples, PB_FACTOR), trial,
                        res, num_samples, chanbits)
            if best is None or trial.get_position() < best[0]:
                best = (trial.get_position(), trial, order, cu)

        escape_bits = num_samples * cfg.bit_depth
        if best[0] >= escape_bits:
            _write_element_header(bits, tag, instance, partial, 0, True, num_samples)
            for j in range(num_samples):
                bits.write(int(samples[j]) & ((1 << cfg.bit_depth) - 1), cfg.bit_depth)
            return

        _, trial, order, cu = best
        self._coef_banks[(ch_index, order)] = cu
        _write_element_header(bits, tag, instance, partial, bs, False, num_samples)
        _append_bits(bits, trial)


def _append_bits(dst: BitBuffer, src: BitBuffer) -> None:
    """Append src's bit contents to dst (bit-aligned splice)."""
    total = src.get_position()
    pos = 0
    src_rd = BitBuffer(bytes(src.buf))
    while pos < total:
        take = min(32, total - pos)
        dst.write(src_rd.read(take), take)
        pos += take
