"""Pure-stdlib baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman).

Round-2 review asked whether the last honest media stub — JPEG entropy
decode — could be closed without a codec library. It can: baseline JPEG
needs nothing beyond ``struct`` + NumPy. This module implements

  * decode: marker walk (DQT/SOF0/SOF1/DHT/SOS/DRI), canonical Huffman
    table construction, entropy decode with byte-unstuffing + restart
    intervals, dequantization, 8x8 IDCT as two matrix multiplies,
    chroma upsampling for arbitrary (h, v) sampling factors, and JFIF
    YCbCr -> RGB. Progressive (SOF2) and arithmetic-coded JPEGs fall
    back to header-only (dims + channels).
  * encode: a minimal baseline writer (4:4:4 or 4:2:0, flat or scaled
    quant tables, fixed-length canonical Huffman tables) used as the
    test-fixture generator so decode round-trips are verified without
    any external image.

Everything here derives from the public T.81 spec; the reference engine
has no JPEG path (its providers ship geometry, not media) — this is an
engine-extra for the multimodal pipeline.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


# natural index of the k-th zigzag position (T.81 figure A.6)
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal 8x8 DCT-II matrix: forward S = M f M^T, inverse f = M^T S M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _extend(v: int, size: int) -> int:
    """DC/AC value extension (T.81 F.2.2.1): ``size``-bit magnitude to
    signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _canonical_codes(bits, vals):
    """BITS/HUFFVAL -> {(length, code): symbol} (T.81 annex C)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over UNSTUFFED entropy bytes."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.d):
                raise JpegError("entropy stream truncated")
            self.acc = self.d[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


def _decode_block(br: _BitReader, dctab, actab, pred: int,
                  qtab: np.ndarray) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.float64)
    s = br.huff(dctab)
    dc = pred + _extend(br.bits(s), s)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = br.huff(actab)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past block end")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz
    block = (coef * qtab).reshape(8, 8)
    return _M.T @ block @ _M, dc


def _entropy_intervals(b: bytes, pos: int):
    """Split the scan's entropy data at restart markers, unstuffing
    0xFF00; returns (intervals, pos_after)."""
    intervals = []
    cur = bytearray()
    i = pos
    while i < len(b):
        c = b[i]
        if c == 0xFF:
            m = b[i + 1] if i + 1 < len(b) else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # real marker ends the scan
        cur.append(c)
        i += 1
    intervals.append(bytes(cur))
    return intervals, i


def _decode_scan(b: bytes, pos: int, scan, by_id, qt, huff,
                 restart: int, planes, width: int, height: int,
                 hmax: int, vmax: int, mcux: int, mcuy: int) -> int:
    """Entropy-decode one scan (T.81 baseline: interleaved when the scan
    carries >1 component, else the component's own ceil(cw/8) x ceil(ch/8)
    data-unit grid) into ``planes``; returns the stream position after the
    scan's entropy data."""
    interleaved = len(scan) > 1
    intervals, pos_after = _entropy_intervals(b, pos)
    pred = {cid: 0 for cid, _, _ in scan}
    it = iter(intervals)
    br = _BitReader(next(it))
    if interleaved:
        n_mcu = mcux * mcuy
    else:
        cid0 = scan[0][0]
        _, h0, v0, _ = by_id[cid0]
        bw0 = -(-(-(-width * h0 // hmax)) // 8)
        bh0 = -(-(-(-height * v0 // vmax)) // 8)
        n_mcu = bw0 * bh0
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            br = _BitReader(next(it))
            pred = {cid: 0 for cid in pred}
        if interleaved:
            my, mx = divmod(m, mcux)
            for cid, td, ta in scan:
                _, h, v, tq = by_id[cid]
                for vy in range(v):
                    for hx in range(h):
                        blk, pred[cid] = _decode_block(
                            br, huff[(0, td)], huff[(1, ta)],
                            pred[cid], qt[tq])
                        y0 = (my * v + vy) * 8
                        x0 = (mx * h + hx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = blk
        else:
            cid, td, ta = scan[0]
            my, mx = divmod(m, bw0)
            blk, pred[cid] = _decode_block(
                br, huff[(0, td)], huff[(1, ta)], pred[cid],
                qt[by_id[cid][3]])
            planes[cid][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = blk
    return pos_after


def decode_jpeg(b: bytes) -> dict:
    """Full baseline decode, including multi-scan (non-interleaved
    per-component scans — T.81 permits several SOS segments in a baseline
    stream); header-only dict (pixels None) for progressive/arithmetic
    payloads or when some SOF component never receives a scan."""
    if b[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None  # [(cid, h, v, tq)]
    width = height = None
    restart = 0
    baseline = True
    pos = 2
    planes = None
    by_id = {}
    hmax = vmax = mcux = mcuy = 0
    scanned: set[int] = set()
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", b, pos + 2)
        body = b[pos + 4:pos + 2 + ln]
        nxt = pos + 2 + ln
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tab = np.frombuffer(body, dtype=np.uint8,
                                        count=64, offset=i).astype(np.float64)
                    i += 64
                else:
                    tab = np.frombuffer(body[i:i + 128],
                                        dtype=">u2").astype(np.float64)
                    i += 128
                nat = np.zeros(64)
                nat[ZIGZAG] = tab
                qt[tq] = nat
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline/extended huffman
            _, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            comps = [(body[6 + 3 * i], body[7 + 3 * i] >> 4,
                      body[7 + 3 * i] & 0x0F, body[8 + 3 * i])
                     for i in range(nc)]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            _, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            comps = [(body[6 + 3 * i], body[7 + 3 * i] >> 4,
                      body[7 + 3 * i] & 0x0F, body[8 + 3 * i])
                     for i in range(nc)]
            baseline = False  # progressive/lossless/arithmetic
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                     body[2 + 2 * i] & 0x0F) for i in range(ns)]
            epos = pos + 2 + ln
            if baseline and qt and huff:
                if planes is None:
                    hmax = max(c[1] for c in comps)
                    vmax = max(c[2] for c in comps)
                    mcux = -(-width // (8 * hmax))
                    mcuy = -(-height // (8 * vmax))
                    by_id = {c[0]: c for c in comps}
                    # MCU-aligned planes are >= any scan's own grid, so
                    # they serve interleaved and per-component scans alike
                    planes = {
                        cid: np.zeros((mcuy * v * 8, mcux * h * 8),
                                      dtype=np.float64)
                        for cid, h, v, _tq in comps}
                pos = _decode_scan(b, epos, scan, by_id, qt, huff,
                                   restart, planes, width, height,
                                   hmax, vmax, mcux, mcuy)
                scanned.update(cid for cid, _, _ in scan)
            else:
                _, pos = _entropy_intervals(b, epos)
            continue
        pos = nxt
    if width is None or comps is None:
        raise JpegError("JPEG missing SOF")
    info = {"format": "jpeg", "width": int(width), "height": int(height),
            "channels": len(comps), "bitdepth": 8,
            "pixels": None, "samples": None}
    if (not baseline or planes is None
            or scanned != {c[0] for c in comps}):
        return info

    # upsample to full resolution + crop
    full = []
    for cid, h, v, _tq in comps:
        p = planes[cid] + 128.0
        p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        bl = y + 1.772 * cb
        px = np.clip(np.round(np.stack([r, g, bl], axis=-1)),
                     0, 255).astype(np.uint8)
    info["pixels"] = px
    return info


# ---------------------------------------------------------------------------
# minimal baseline encoder (fixture generator)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits


def _enc_tables():
    """Fixed-length canonical tables: 12 DC categories at 4 bits, all
    162 AC (run, size) symbols at 8 bits — valid Huffman tables (the
    all-ones max-length code stays unused) without carrying the Annex K
    constants."""
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_vals = [0x00, 0xF0] + [(r << 4) | s
                              for r in range(16) for s in range(1, 11)]
    ac_bits = [0] * 7 + [len(ac_vals)] + [0] * 8
    return (dc_bits, dc_vals), (ac_bits, ac_vals)


def _enc_code_map(bits, vals):
    m = {}
    for (ln, code), sym in _canonical_codes(bits, vals).items():
        m[sym] = (code, ln)
    return m


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, block: np.ndarray, qtab: np.ndarray,
                  pred: int, dcm, acm) -> int:
    coef = _M @ (block - 128.0) @ _M.T
    q = np.round(coef.reshape(-1) / qtab).astype(np.int64)
    zz = q[ZIGZAG]
    diff = int(zz[0]) - pred
    s = _size_cat(diff)
    code, ln = dcm[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = acm[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _size_cat(v)
        code, ln = acm[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = acm[0x00]
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(pixels: np.ndarray, quant: int = 1,
                subsample: bool = False, restart: int = 0,
                multiscan: bool = False) -> bytes:
    """Baseline JPEG writer: grayscale or RGB, 4:4:4 (default) or 4:2:0
    (``subsample=True``), flat quant tables of ``quant`` (1 = as near
    lossless as the DCT rounding allows), optional DRI restart interval
    of ``restart`` MCUs (exercises the decoder's RST path).

    ``multiscan=True`` writes one non-interleaved SOS per component (a
    legal baseline layout per T.81 — exercises the decoder's multi-scan
    path); incompatible with ``restart``."""
    if multiscan and restart:
        raise JpegError("multiscan fixtures do not support restart")
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    if nch == 3:
        r, g, bl = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        chans = [y, cb, cr]
    else:
        chans = [px[..., 0]]
        subsample = False
    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(s[0] for s in samp[:len(chans)])
    vmax = max(s[1] for s in samp[:len(chans)])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qtab = np.full(64, float(quant))
    (dcb, dcv), (acb, acv) = _enc_tables()
    dcm, acm = _enc_code_map(dcb, dcv), _enc_code_map(acb, acv)

    # pad each plane to its MCU-aligned size (edge replicate)
    padded = []
    for i, ch in enumerate(chans):
        sh, sv = samp[i]
        if (sh, sv) != (hmax, vmax):  # 4:2:0 chroma: 2x2 mean
            ev = np.pad(ch, ((0, h % 2), (0, w % 2)), mode="edge")
            ch = ev.reshape(ev.shape[0] // 2, 2,
                            ev.shape[1] // 2, 2).mean(axis=(1, 3))
        th = mcuy * 8 * sv
        tw = mcux * 8 * sh
        ch = np.pad(ch, ((0, th - ch.shape[0]), (0, tw - ch.shape[1])),
                    mode="edge")
        padded.append(ch)

    if multiscan:
        # one entropy segment per component, each over its own
        # ceil(cw/8) x ceil(ch/8) grid (T.81 non-interleaved scan)
        scans = []
        for i, ch in enumerate(padded):
            sh, sv = samp[i]
            cw = -(-w * sh // hmax)
            ch_h = -(-h * sv // vmax)
            bwn, bhn = -(-cw // 8), -(-ch_h // 8)
            bw = _BitWriter()
            pred_i = 0
            for m in range(bwn * bhn):
                my, mx = divmod(m, bwn)
                pred_i = _encode_block(
                    bw, ch[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8],
                    qtab, pred_i, dcm, acm)
            bw.flush()
            scans.append(bytes(bw.out))
        entropy = None
    else:
        entropy = bytearray()
        bw = _BitWriter()
        pred = [0] * len(chans)
        rst = 0
        for m in range(mcux * mcuy):
            if restart and m and m % restart == 0:
                bw.flush()
                entropy += bw.out
                entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                bw = _BitWriter()
                pred = [0] * len(chans)
            my, mx = divmod(m, mcux)
            for i, ch in enumerate(padded):
                sh, sv = samp[i]
                for vy in range(sv):
                    for hx in range(sh):
                        y0 = (my * sv + vy) * 8
                        x0 = (mx * sh + hx) * 8
                        pred[i] = _encode_block(
                            bw, ch[y0:y0 + 8, x0:x0 + 8], qtab, pred[i],
                            dcm, acm)
        bw.flush()
        entropy += bw.out

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zzq = np.zeros(64, dtype=np.uint8)
    zzq[np.arange(64)] = qtab[ZIGZAG].astype(np.uint8)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zzq.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(chans))
    for i in range(len(chans)):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dcb) + bytes(dcv))
    out += seg(0xC4, bytes([0x10]) + bytes(acb) + bytes(acv))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    if multiscan:
        for i in range(len(chans)):
            sos = bytes([1, i + 1, 0x00, 0, 63, 0])
            out += seg(0xDA, sos)
            out += scans[i]
    else:
        sos = bytes([len(chans)])
        for i in range(len(chans)):
            sos += bytes([i + 1, 0x00])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)
