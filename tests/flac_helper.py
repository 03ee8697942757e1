"""Minimal FLAC *encoder* used only by tests to exercise the native
decoder (``native/dataio.cc::flac_read``) — no codec libraries exist
in this image, so round-trip coverage requires writing valid FLAC
streams ourselves.  Supports constant / verbatim / fixed-predictor
(orders 0-2, Rice partition order 0) subframes, independent and
left-side / mid-side stereo, proper header CRC-8 and frame CRC-16.
"""
from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value: int, n: int) -> None:
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.bits(0, 8 - self.nbits)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def _utf8_number(w: BitWriter, v: int) -> None:
    if v < 0x80:
        w.bits(v, 8)
    elif v < 0x800:
        w.bits(0xC0 | (v >> 6), 8)
        w.bits(0x80 | (v & 0x3F), 8)
    else:
        w.bits(0xE0 | (v >> 12), 8)
        w.bits(0x80 | ((v >> 6) & 0x3F), 8)
        w.bits(0x80 | (v & 0x3F), 8)


def _rice_param(res: np.ndarray) -> int:
    mean = float(np.abs(res).mean()) if len(res) else 0.0
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _write_subframe(w: BitWriter, x: np.ndarray, bps: int,
                    mode: str, wasted: int = 0) -> None:
    """When ``wasted`` > 0 every sample must have that many low zero
    bits; they are stripped here and the decoder restores them."""
    x = x.astype(np.int64)
    if wasted:
        assert (x & ((1 << wasted) - 1) == 0).all()
        x = x >> wasted
        bps -= wasted

    def wflag():
        if wasted:
            w.bits(1, 1)
            w.bits(0, wasted - 1) if wasted > 1 else None
            w.bits(1, 1)
        else:
            w.bits(0, 1)
    if mode == "constant":
        assert (x == x[0]).all()
        w.bits(0, 1)
        w.bits(0, 6)        # CONSTANT
        wflag()
        w.bits(int(x[0]), bps)
        return
    if mode == "verbatim":
        w.bits(0, 1)
        w.bits(1, 6)        # VERBATIM
        wflag()
        for v in x:
            w.bits(int(v), bps)
        return
    if mode.startswith("lpc"):
        # Quantized-LPC subframe: order-2, fixed coefficients
        # (1.6, -0.64 at shift 10 — any valid coefficients round-trip
        # losslessly since the residual absorbs the prediction error).
        order, prec, shift = 2, 12, 10
        coef = [int(1.6 * (1 << shift)), int(-0.64 * (1 << shift))]
        w.bits(0, 1)
        w.bits(0b100000 | (order - 1), 6)  # LPC
        wflag()
        for v in x[:order]:
            w.bits(int(v), bps)
        w.bits(prec - 1, 4)
        w.bits(shift, 5)
        for c in coef:
            w.bits(c, prec)
        res = np.empty(len(x) - order, np.int64)
        for i in range(order, len(x)):
            pred = (coef[0] * int(x[i - 1])
                    + coef[1] * int(x[i - 2])) >> shift
            res[i - order] = int(x[i]) - pred
    else:
        order = int(mode[len("fixed"):])   # fixed0 / fixed1 / fixed2
        w.bits(0, 1)
        w.bits(0b001000 | order, 6)        # FIXED
        wflag()
        for v in x[:order]:
            w.bits(int(v), bps)
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
    # residual: Rice method 0, partition order 0
    w.bits(0, 2)
    w.bits(0, 4)
    p = _rice_param(res)
    w.bits(p, 4)
    for r in res:
        u = (int(r) << 1) ^ (int(r) >> 63)
        q = u >> p
        w.bits(0, q) if q else None
        w.bits(1, 1)
        if p:
            w.bits(u & ((1 << p) - 1), p)


def write_flac(path: str, samples: np.ndarray, sr: int,
               bps: int = 16, block: int = 256,
               subframe: str = "fixed1",
               stereo: str = "independent",
               wasted: int = 0) -> None:
    """samples: int array (T,) mono or (2, T) stereo, within bps range."""
    samples = np.atleast_2d(np.asarray(samples, np.int64))
    nch, total = samples.shape
    w = BitWriter()
    w.bits(0x664C6143, 32)                 # fLaC
    # STREAMINFO (last metadata block)
    w.bits(1, 1)
    w.bits(0, 7)
    w.bits(34, 24)
    w.bits(block, 16)
    w.bits(block, 16)
    w.bits(0, 24)
    w.bits(0, 24)
    w.bits(sr, 20)
    w.bits(nch - 1, 3)
    w.bits(bps - 1, 5)
    w.bits(total, 36)
    for _ in range(16):
        w.bits(0, 8)                       # md5 unset
    frames = -(-total // block)
    for fi in range(frames):
        seg = samples[:, fi * block: (fi + 1) * block]
        bs = seg.shape[1]
        fw = BitWriter()
        fw.bits(0x3FFE, 14)
        fw.bits(0, 1)                      # reserved
        fw.bits(0, 1)                      # fixed blocksize strategy
        fw.bits(7, 4)                      # 16-bit blocksize-1 follows
        fw.bits(0, 4)                      # sample rate from STREAMINFO
        if nch == 1 or stereo == "independent":
            fw.bits(nch - 1, 4)
        elif stereo == "left_side":
            fw.bits(8, 4)
        elif stereo == "mid_side":
            fw.bits(10, 4)
        else:
            raise ValueError(stereo)
        fw.bits(4, 3)                      # 16-bit samples
        fw.bits(0, 1)                      # reserved
        _utf8_number(fw, fi)
        fw.bits(bs - 1, 16)
        hdr = fw.data() if fw.nbits == 0 else None
        assert hdr is not None             # header is byte-aligned here
        fw.bits(crc8(hdr), 8)
        if nch == 1 or stereo == "independent":
            for c in range(nch):
                _write_subframe(fw, seg[c], bps, subframe, wasted)
        elif stereo == "left_side":
            side = seg[0] - seg[1]
            _write_subframe(fw, seg[0], bps, subframe)
            _write_subframe(fw, side, bps + 1, subframe)
        else:                              # mid_side
            mid = (seg[0] + seg[1]) >> 1
            side = seg[0] - seg[1]
            _write_subframe(fw, mid, bps, subframe)
            _write_subframe(fw, side, bps + 1, subframe)
        fw.align()
        body = fw.data()
        fw.bits(crc16(body), 16)
        frame = fw.data()
        for b in frame:
            w.bits(b, 8)
    with open(path, "wb") as f:
        f.write(w.data())
