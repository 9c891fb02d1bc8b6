"""FLAC codec in stdlib + numpy — closes the compressed-audio half of
the multimodal stub (the env has no audio libs, but FLAC is a fully
public format: rice-coded residuals over fixed/LPC predictors, spec at
xiph.org / RFC 9639).

Scope (``decode_flac_samples`` returns None outside it, so callers can
tell "decodable natively" from "genuinely needs an audio library"):

- decode: 16-bit streams (the encoder's own envelope and the dominant
  real-world depth), 1-2 channels, all four channel assignments
  (independent, left/side, right/side, mid/side), CONSTANT / VERBATIM /
  FIXED (orders 0-4) / LPC subframes, rice + rice2 residual coding with
  partitions and the escape (verbatim-residual) code, wasted-bits
  shifts, UTF-8 frame numbers, frame-header CRC-8 and frame CRC-16
  verified.
- encode (the round-trip rig, and a valid FLAC writer in its own
  right): 16-bit, fixed blocking, CONSTANT / VERBATIM / FIXED
  subframes chosen per block (optionally a legal order-2 LPC subframe
  to exercise that decode path), selectable stereo decorrelation,
  selectable rice partition order, correct CRCs and STREAMINFO.

Determinism: pure integer arithmetic end-to-end — the same payload
always yields the same samples on any host (the partition-invariance
property every codec in this package guarantees).

Throughput honesty: the entropy layer is a Python bit loop (rice codes
are not byte-aligned, and numpy cannot vectorize data-dependent unary
runs without major contortions); that bounds single-payload decode
speed well below a C codec. The Spark-side shape is unchanged — the
codec runs inside Arrow ``mapInPandas`` batches, payloads decode where
they land, bytes never shuffle — so scale-out is by partition count,
which is the property that matters at 100 TB.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TAB = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_RATE_TAB = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_TAB = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (the FLAC frame-header CRC)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (the FLAC frame CRC)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader over bytes, with a byte-position anchor so
    frame CRCs can be computed over the exact consumed span."""

    __slots__ = ("d", "bitpos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.d = data
        self.bitpos = bitpos

    def u(self, n: int) -> int:
        v = 0
        d, p = self.d, self.bitpos
        for _ in range(n):
            byte = d[p >> 3]
            v = (v << 1) | ((byte >> (7 - (p & 7))) & 1)
            p += 1
        self.bitpos = p
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        d, p = self.d, self.bitpos
        q = 0
        while ((d[p >> 3] >> (7 - (p & 7))) & 1) == 0:
            q += 1
            p += 1
        self.bitpos = p + 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _read_utf8_number(br: _Bits) -> int:
    """FLAC's UTF-8-style frame/sample number coding (extended to 36
    bits — up to 6 continuation bytes)."""
    b0 = br.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0 or n > 6:
        raise ValueError("bad UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.u(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _Bits, n: int, order: int) -> list[int]:
    """Rice-coded residual section: 2-bit method, 4-bit partition
    order, 2^po partitions with per-partition rice parameter (or the
    escape → raw s-bit residuals)."""
    method = br.u(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    po = br.u(4)
    nparts = 1 << po
    if n % nparts:
        raise ValueError("block size not divisible by partitions")
    out: list[int] = []
    for part in range(nparts):
        cnt = (n >> po) - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("negative partition count")
        param = br.u(pbits)
        if param == escape:
            raw = br.u(5)
            if raw == 0:
                out.extend([0] * cnt)
            else:
                for _ in range(cnt):
                    out.append(br.s(raw))
        else:
            for _ in range(cnt):
                q = br.unary()
                r = br.u(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))  # unzigzag
    return out


def _decode_subframe(br: _Bits, n: int, bps: int) -> np.ndarray:
    if br.u(1):
        raise ValueError("subframe padding bit set")
    sft = br.u(6)
    wasted = 0
    if br.u(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if sft == 0:  # CONSTANT
        v = br.s(eff)
        out = np.full(n, v, dtype=np.int64)
    elif sft == 1:  # VERBATIM
        out = np.array([br.s(eff) for _ in range(n)], dtype=np.int64)
    elif 8 <= sft <= 12:  # FIXED, order 0-4
        order = sft - 8
        warm = [br.s(eff) for _ in range(order)]
        res = _read_residual(br, n, order)
        coefs = _FIXED_COEFS[order]
        samples = list(warm)
        for i, e in enumerate(res):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[order + i - 1 - j]
            samples.append(pred + e)
        out = np.array(samples, dtype=np.int64)
    elif sft >= 32:  # LPC, order 1-32
        order = sft - 31
        warm = [br.s(eff) for _ in range(order)]
        prec = br.u(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = br.s(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.s(prec) for _ in range(order)]
        res = _read_residual(br, n, order)
        samples = list(warm)
        for i, e in enumerate(res):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[order + i - 1 - j]
            samples.append((acc >> shift) + e)
        out = np.array(samples, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {sft}")
    if wasted:
        out = out << wasted
    return out


def sniff_flac(raw: bytes) -> dict | None:
    """STREAMINFO header decode, stdlib-only: rate / channels / bit
    depth / total samples → duration. None when not a FLAC stream."""
    info = _streaminfo(raw)
    if info is None:
        return None
    rate, channels, bps, total, _ = info
    return {
        "mime": "audio/flac",
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bps,
        "n_frames": total,
        "duration_s": (total / rate) if rate else None,
    }


def _streaminfo(raw: bytes) -> tuple[int, int, int, int, int] | None:
    """(rate, channels, bps, total_samples, first_frame_offset)."""
    if len(raw) < 42 or raw[:4] != b"fLaC":
        return None
    pos = 4
    found = None
    while pos + 4 <= len(raw):
        hdr = raw[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        ln = int.from_bytes(raw[pos + 1 : pos + 4], "big")
        body = raw[pos + 4 : pos + 4 + ln]
        if btype == 0 and len(body) >= 34:
            br = _Bits(body)
            br.u(16)  # min blocksize
            br.u(16)  # max blocksize
            br.u(24)  # min framesize
            br.u(24)  # max framesize
            rate = br.u(20)
            channels = br.u(3) + 1
            bps = br.u(5) + 1
            total = br.u(36)
            found = (rate, channels, bps, total)
        pos += 4 + ln
        if last:
            break
    if found is None or pos > len(raw):
        return None
    rate, channels, bps, total = found
    return rate, channels, bps, total, pos


def decode_flac_samples(raw: bytes) -> tuple[int, np.ndarray] | None:
    """FLAC → ``(sample_rate, (n_frames, channels) int16 ndarray)``, or
    None when the payload is not a FLAC stream this codec covers
    (non-16-bit, >2 channels, corrupt CRC)."""
    try:
        return _decode(raw)
    except Exception:
        return None


def _decode(raw: bytes) -> tuple[int, np.ndarray] | None:
    info = _streaminfo(raw)
    if info is None:
        return None
    rate, channels, bps, total, pos = info
    if bps != 16 or channels not in (1, 2) or rate == 0:
        return None
    chans: list[np.ndarray] = []
    got = 0
    # total_samples == 0 is LEGAL (RFC 9639: "0 means unknown" — a
    # streaming encoder that can't seek back writes it); decode until
    # the byte stream runs out instead of refusing the file
    while (total == 0 or got < total) and pos + 4 <= len(raw):
        frame_start = pos
        br = _Bits(raw, pos * 8)
        sync = br.u(14)
        if sync != 0x3FFE:
            if total == 0 and chans:
                # unknown-length stream: non-frame trailing bytes
                # (ID3v1 tag, padding) mark end-of-stream, not
                # corruption — keep what decoded
                break
            return None
        br.u(1)  # reserved
        br.u(1)  # blocking strategy
        bs_code = br.u(4)
        rate_code = br.u(4)
        chan_code = br.u(4)
        bps_code = br.u(3)
        br.u(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            return None
        elif bs_code == 6:
            n = br.u(8) + 1
        elif bs_code == 7:
            n = br.u(16) + 1
        else:
            n = _BLOCKSIZE_TAB[bs_code]
        if rate_code == 12:
            br.u(8)
        elif rate_code in (13, 14):
            br.u(16)
        elif rate_code == 15:
            return None
        fbps = _BPS_TAB.get(bps_code, bps if bps_code == 0 else None)
        if fbps is None or fbps != 16:
            return None
        hdr_end = (br.bitpos + 7) // 8
        if _crc8(raw[frame_start:hdr_end]) != raw[hdr_end]:
            raise ValueError("frame header CRC mismatch")
        br.bitpos = (hdr_end + 1) * 8
        if chan_code < 8:
            nch = chan_code + 1
            if nch != channels:
                return None
            subs = [_decode_subframe(br, n, 16) for _ in range(nch)]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                return None
            # side channel carries one extra bit
            if chan_code == 8:  # left/side
                left = _decode_subframe(br, n, 16)
                side = _decode_subframe(br, n, 17)
                subs = [left, left - side]
            elif chan_code == 9:  # right/side
                side = _decode_subframe(br, n, 17)
                right = _decode_subframe(br, n, 16)
                subs = [right + side, right]
            else:  # mid/side
                mid = _decode_subframe(br, n, 16)
                side = _decode_subframe(br, n, 17)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            return None
        br.align()
        crc_pos = br.bitpos // 8
        if crc_pos + 2 > len(raw):
            return None
        want = struct.unpack(">H", raw[crc_pos : crc_pos + 2])[0]
        if _crc16(raw[frame_start:crc_pos]) != want:
            raise ValueError("frame CRC mismatch")
        pos = crc_pos + 2
        take = min(n, total - got) if total else n
        frame = np.stack([s[:take] for s in subs], axis=1)
        chans.append(frame)
        got += take
    if not chans:
        return None
    out = np.concatenate(chans, axis=0)
    if np.any(out < -32768) or np.any(out > 32767):
        raise ValueError("sample out of 16-bit range")
    return rate, out.astype(np.int16)


# ---------------------------------------------------------------------------
# Encoder (round-trip rig + valid FLAC writer)
# ---------------------------------------------------------------------------


class _BitsW:
    __slots__ = ("out", "buf", "n")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def u(self, v: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.buf = (self.buf << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                self.buf, self.n = 0, 0

    def s(self, v: int, bits: int) -> None:
        self.u(v & ((1 << bits) - 1), bits)

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.u(0, 1)
        self.u(1, 1)

    def align(self) -> None:
        while self.n:
            self.u(0, 1)


def _utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 1
    while v >= (1 << (6 + 5 * nbytes)) and nbytes < 6:
        nbytes += 1
    lead_bits = 6 - nbytes
    shift = 6 * nbytes
    lead = (0xFF << (lead_bits + 1)) & 0xFF | (v >> shift)
    out.append(lead)
    for i in range(nbytes - 1, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_cost(res: list[int], param: int) -> int:
    c = 0
    for e in res:
        zz = (e << 1) if e >= 0 else (((-e) << 1) - 1)
        c += (zz >> param) + 1 + param
    return c


def _write_residual(
    bw: _BitsW, res: list[int], order: int, n: int, partition_order: int
) -> None:
    """Rice method 0 (4-bit params), per-partition parameter chosen by
    exact cost; escapes to raw storage when rice would be worse."""
    while partition_order > 0 and (
        n % (1 << partition_order) or (n >> partition_order) <= order
    ):
        partition_order -= 1
    bw.u(0, 2)
    bw.u(partition_order, 4)
    nparts = 1 << partition_order
    idx = 0
    for part in range(nparts):
        cnt = (n >> partition_order) - (order if part == 0 else 0)
        chunk = res[idx : idx + cnt]
        idx += cnt
        best_p, best_c = 0, None
        for p in range(15):
            c = _rice_cost(chunk, p)
            if best_c is None or c < best_c:
                best_p, best_c = p, c
        maxabs = max((abs(e) for e in chunk), default=0)
        rawbits = max(maxabs.bit_length() + 1, 1) if maxabs else 0
        if rawbits and best_c > 5 + rawbits * cnt:
            bw.u(15, 4)  # escape
            bw.u(rawbits, 5)
            for e in chunk:
                bw.s(e, rawbits)
        elif not chunk:
            bw.u(best_p, 4)
        else:
            bw.u(best_p, 4)
            for e in chunk:
                zz = (e << 1) if e >= 0 else (((-e) << 1) - 1)
                bw.unary(zz >> best_p)
                if best_p:
                    bw.u(zz & ((1 << best_p) - 1), best_p)


def _encode_subframe(
    bw: _BitsW,
    x: np.ndarray,
    bps: int,
    partition_order: int,
    force_lpc: bool,
) -> None:
    vals = [int(v) for v in x]
    n = len(vals)
    if all(v == vals[0] for v in vals):
        bw.u(0, 1)
        bw.u(0, 6)  # CONSTANT
        bw.u(0, 1)
        bw.s(vals[0], bps)
        return
    if force_lpc and n > 2:
        # a legal order-2 LPC subframe with the fixed-order-2
        # coefficients (2, -1) at shift 0 — exercises the decoder's
        # LPC path with exact integer prediction
        order, coefs, shift, prec = 2, [2, -1], 0, 15
        bw.u(0, 1)
        bw.u(32 + order - 1, 6)
        bw.u(0, 1)
        for v in vals[:order]:
            bw.s(v, bps)
        bw.u(prec - 1, 4)
        bw.s(shift, 5)
        for c in coefs:
            bw.s(c, prec)
        res = [
            vals[i] - ((coefs[0] * vals[i - 1] + coefs[1] * vals[i - 2]) >> shift)
            for i in range(order, n)
        ]
        _write_residual(bw, res, order, n, partition_order)
        return
    # pick the cheapest FIXED order 0-2 by total |residual|
    best = None
    for order in range(0, min(3, n)):
        coefs = _FIXED_COEFS[order]
        res = [
            vals[i] - sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        cost = sum(abs(e) for e in res)
        if best is None or cost < best[2]:
            best = (order, res, cost)
    order, res, _ = best
    # FIXED residuals of 16-bit input fit rice; if any residual would
    # overflow the escape's 31-bit raw cap, fall back to VERBATIM
    if any(abs(e) > (1 << 30) for e in res):
        bw.u(0, 1)
        bw.u(1, 6)  # VERBATIM
        bw.u(0, 1)
        for v in vals:
            bw.s(v, bps)
        return
    bw.u(0, 1)
    bw.u(8 + order, 6)
    bw.u(0, 1)
    for v in vals[:order]:
        bw.s(v, bps)
    _write_residual(bw, res, order, n, partition_order)


def encode_flac(
    samples: np.ndarray,
    rate: int,
    blocksize: int = 4096,
    stereo: str = "independent",
    partition_order: int = 0,
    force_lpc: bool = False,
) -> bytes:
    """``(n_frames, channels)`` int16 → FLAC bytes (fixed blocking,
    16-bit). ``stereo``: ``independent`` / ``left_side`` /
    ``right_side`` / ``mid_side`` (2-channel input only) — the four
    channel assignments the decoder supports. ``partition_order`` sets
    the rice partitioning of every residual section (clamped per block
    when it does not divide). ``force_lpc`` encodes non-constant
    subframes as a legal order-2 LPC subframe instead of FIXED."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_flac expects int16 samples")
    nfr, nch = samples.shape
    if nch not in (1, 2):
        raise ValueError("1 or 2 channels only")
    if stereo != "independent" and nch != 2:
        raise ValueError("stereo decorrelation needs 2 channels")
    if nfr == 0:
        raise ValueError("empty audio")
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitsW()
    si.u(blocksize, 16)
    si.u(blocksize, 16)
    si.u(0, 24)
    si.u(0, 24)
    si.u(rate, 20)
    si.u(nch - 1, 3)
    si.u(15, 5)  # bps - 1
    si.u(nfr, 36)
    body = bytes(si.out) + bytes(16)  # md5 unset (all zero = unknown)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    chan_code = {
        "independent": nch - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }[stereo]
    x = samples.astype(np.int64)
    frame_no = 0
    for start in range(0, nfr, blocksize):
        blk = x[start : start + blocksize]
        n = blk.shape[0]
        hdr = _BitsW()
        hdr.u(0x3FFE, 14)
        hdr.u(0, 1)
        hdr.u(0, 1)  # fixed blocking
        hdr.u(7, 4)  # blocksize: 16-bit at end of header
        hdr.u(0, 4)  # rate: from STREAMINFO
        hdr.u(chan_code, 4)
        hdr.u(4, 3)  # bps 16
        hdr.u(0, 1)
        hdr.align()
        head = bytes(hdr.out) + _utf8_number(frame_no) + struct.pack(">H", n - 1)
        head += bytes([_crc8(head)])
        bw = _BitsW()
        if stereo == "independent":
            chans = [(blk[:, c], 16) for c in range(nch)]
        elif stereo == "left_side":
            chans = [(blk[:, 0], 16), (blk[:, 0] - blk[:, 1], 17)]
        elif stereo == "right_side":
            chans = [(blk[:, 0] - blk[:, 1], 17), (blk[:, 1], 16)]
        else:  # mid_side
            s = blk[:, 0] - blk[:, 1]
            m = (blk[:, 0] + blk[:, 1]) >> 1
            chans = [(m, 16), (s, 17)]
        for cx, cbps in chans:
            _encode_subframe(bw, cx, cbps, partition_order, force_lpc)
        bw.align()
        frame = head + bytes(bw.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
