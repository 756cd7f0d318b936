"""MiniSEED (SEED 2.4) record codec — pure numpy/struct, no mseedlib.

Implements the public FDSN SEED 2.4 data-record format (reference
behavior: nzgmdb/mseed_management/reading.py:15-68, which delegates to
mseedlib): the 48-byte big-endian fixed header, blockette 1000
(encoding / word order / record length), and the Steim1 and Steim2
compressed integer encodings plus uncompressed INT16/INT32/FLOAT32/
FLOAT64. Both directions are provided — ``encode_records`` exists so the
decode path can be round-trip tested against bit-exact fixtures without
any external library.

Format facts used here (all from the published SEED 2.4 manual):
- Fixed header: sequence(6s) quality(1s) reserved(1s) station(5s)
  location(2s) channel(3s) network(2s) BTIME(year u16, doy u16, h, m, s,
  unused, fract u16) nsamples(u16) rate_factor(i16) rate_multiplier(i16)
  4 flag/count bytes, time_correction(i32), data_offset(u16),
  blockette_offset(u16) — 48 bytes, big-endian.
- Blockette 1000: type(u16=1000) next(u16) encoding(u8) word_order(u8)
  reclen_exp(u8) reserved(u8).
- Steim frames are 64 bytes: word 0 holds sixteen 2-bit control nibbles
  (00 = not data, 01/10/11 = packing class); frame 0 words 1-2 are the
  forward (X0) and reverse (Xn) integration constants. Steim1 classes:
  01 = four 8-bit diffs, 10 = two 16-bit, 11 = one 32-bit. Steim2:
  01 = four 8-bit; 10 with high-2-bit dnib 01/10/11 = one 30-bit / two
  15-bit / three 10-bit; 11 with dnib 00/01/10 = five 6-bit / six 5-bit /
  seven 4-bit.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np

ENC_INT16 = 1
ENC_INT32 = 3
ENC_FLOAT32 = 4
ENC_FLOAT64 = 5
ENC_STEIM1 = 10
ENC_STEIM2 = 11

_HDR = struct.Struct(">6s1s1s5s2s3s2sHHBBBxHHhhBBBBiHH")


@dataclass
class TraceSegment:
    network: str
    station: str
    location: str
    channel: str
    starttime: float  # epoch seconds (UTC)
    rate: float
    samples: np.ndarray

    @property
    def source_id(self) -> str:
        return "_".join(
            [self.network, self.station, self.location, self.channel]
        )


def _sext(v: int, bits: int) -> int:
    """Two's-complement sign extension of a ``bits``-wide field."""
    mask = (1 << bits) - 1
    v &= mask
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


# --- Steim decode -----------------------------------------------------------

# Steim2 class-3 / class-2 sub-packings: dnib -> (count, bit width)
_S2_C2 = {1: (1, 30), 2: (2, 15), 3: (3, 10)}
_S2_C3 = {0: (5, 6), 1: (6, 5), 2: (7, 4)}


def _steim_diffs(buf: bytes, version: int) -> tuple[int, int, list[int]]:
    """Parse Steim frames → (x0, xn, raw difference list)."""
    words = np.frombuffer(buf, dtype=">u4")
    nframes = len(words) // 16
    diffs: list[int] = []
    x0 = xn = 0
    for f in range(nframes):
        frame = words[f * 16 : (f + 1) * 16]
        ctrl = int(frame[0])
        for w in range(1, 16):
            c = (ctrl >> (2 * (15 - w))) & 3
            word = int(frame[w])
            if f == 0 and w == 1:
                x0 = _sext(word, 32)
                continue
            if f == 0 and w == 2:
                xn = _sext(word, 32)
                continue
            if c == 0:
                continue
            if c == 1:  # four 8-bit
                diffs.extend(_sext(word >> s, 8) for s in (24, 16, 8, 0))
            elif version == 1:
                if c == 2:  # two 16-bit
                    diffs.extend(_sext(word >> s, 16) for s in (16, 0))
                else:  # one 32-bit
                    diffs.append(_sext(word, 32))
            else:
                dnib = word >> 30
                table = _S2_C2 if c == 2 else _S2_C3
                if dnib not in table:
                    raise ValueError(f"invalid Steim2 dnib {dnib} for class {c}")
                n, bits = table[dnib]
                payload_bits = 30 if c == 2 and dnib == 1 else n * bits
                del payload_bits
                for k in range(n):
                    shift = (n - 1 - k) * bits
                    diffs.append(_sext(word >> shift, bits))
    return x0, xn, diffs


def _decode_steim(buf: bytes, nsamples: int, version: int) -> np.ndarray:
    x0, xn, diffs = _steim_diffs(buf, version)
    if not diffs:
        return np.zeros(0, dtype=np.int32)
    out = np.empty(nsamples, dtype=np.int64)
    out[0] = x0  # first diff is vs. the previous record — ignored
    acc = x0
    for i in range(1, nsamples):
        acc += diffs[i]
        out[i] = acc
    if nsamples and acc != xn:
        raise ValueError(
            f"Steim{version} reverse integration mismatch: got {acc}, header says {xn}"
        )
    return out.astype(np.int32)


# --- Steim encode (tests / sink) -------------------------------------------


def _fits(vals: list[int], bits: int) -> bool:
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    return all(lo <= v <= hi for v in vals)


def _pack_word_s1(diffs: list[int], i: int) -> tuple[int, int, int]:
    """(ctrl nibble, word, consumed) for Steim1."""
    rest = diffs[i:]
    if len(rest) >= 4 and _fits(rest[:4], 8):
        w = 0
        for v in rest[:4]:
            w = (w << 8) | (v & 0xFF)
        return 1, w, 4
    if len(rest) >= 2 and _fits(rest[:2], 16):
        w = ((rest[0] & 0xFFFF) << 16) | (rest[1] & 0xFFFF)
        return 2, w, 2
    return 3, rest[0] & 0xFFFFFFFF, 1


_S2_FORMS = [  # (count, bits, ctrl, dnib) densest first
    (7, 4, 3, 2),
    (6, 5, 3, 1),
    (5, 6, 3, 0),
    (4, 8, 1, None),
    (3, 10, 2, 3),
    (2, 15, 2, 2),
    (1, 30, 2, 1),
]


def _pack_word_s2(diffs: list[int], i: int) -> tuple[int, int, int]:
    rest = diffs[i:]
    for n, bits, ctrl, dnib in _S2_FORMS:
        if len(rest) >= n and _fits(rest[:n], bits):
            payload = 0
            for v in rest[:n]:
                payload = (payload << bits) | (v & ((1 << bits) - 1))
            # dnib always occupies bits 30-31 (7x4-bit leaves bits 28-29
            # unused), never packed flush against the payload
            w = payload if dnib is None else ((dnib << 30) | payload)
            return ctrl, w & 0xFFFFFFFF, n
    raise ValueError(f"difference {rest[0]} exceeds 30 bits (Steim2 limit)")


def _encode_steim(samples: np.ndarray, version: int, max_frames: int) -> tuple[bytes, int]:
    """Pack as many samples as fit into ``max_frames`` 64-byte frames.
    Returns (frame bytes, n_samples encoded)."""
    s = samples.astype(np.int64)
    diffs = np.diff(s, prepend=s[:1]).tolist()  # diff[0] = 0 (placeholder)
    pack = _pack_word_s1 if version == 1 else _pack_word_s2
    frames: list[list[tuple[int, int]]] = []  # per frame: [(ctrl, word)]
    i = 0
    n = len(s)
    while i < n and len(frames) < max_frames:
        frame: list[tuple[int, int]] = []
        capacity = 13 if not frames else 15  # frame 0: X0/Xn take 2 words
        while i < n and len(frame) < capacity:
            ctrl, word, consumed = pack(diffs, i)
            frame.append((ctrl, word))
            i += consumed
        frames.append(frame)
    n_enc = min(i, n)
    x0 = int(s[0])
    xn = int(s[n_enc - 1])
    out = bytearray()
    for fi, frame in enumerate(frames):
        words: list[tuple[int, int]] = []
        if fi == 0:
            words.append((0, x0 & 0xFFFFFFFF))
            words.append((0, xn & 0xFFFFFFFF))
        words.extend(frame)
        words.extend([(0, 0)] * (15 - len(words)))
        ctrl = 0
        for c, _ in words:
            ctrl = (ctrl << 2) | c
        out += struct.pack(">I", ctrl)
        for _, w in words:
            out += struct.pack(">I", w)
    return bytes(out), n_enc


# --- record level -----------------------------------------------------------


def _btime(epoch_s: float) -> tuple[int, int, int, int, int, int]:
    dt = datetime.fromtimestamp(epoch_s, tz=timezone.utc)
    doy = (dt - datetime(dt.year, 1, 1, tzinfo=timezone.utc)).days + 1
    fract = round(dt.microsecond / 100.0)
    return dt.year, doy, dt.hour, dt.minute, dt.second, fract


def _btime_to_epoch(year, doy, hour, minute, sec, fract) -> float:
    base = datetime(year, 1, 1, tzinfo=timezone.utc) + timedelta(
        days=int(doy) - 1, hours=int(hour), minutes=int(minute), seconds=int(sec)
    )
    return base.timestamp() + fract * 1e-4


def _rate_from_factor(factor: int, mult: int) -> float:
    if factor == 0:
        return 0.0
    if factor > 0:
        return factor * mult if mult > 0 else -factor / mult
    return -mult / factor if mult > 0 else 1.0 / (factor * mult)


def encode_records(
    samples: np.ndarray,
    *,
    network: str = "NZ",
    station: str = "TEST",
    location: str = "10",
    channel: str = "HNZ",
    starttime: float = 0.0,
    rate: float = 100.0,
    encoding: int = ENC_STEIM2,
    reclen: int = 512,
) -> bytes:
    """Encode a sample series into one or more MiniSEED records."""
    reclen_exp = int(np.log2(reclen))
    if 2**reclen_exp != reclen:
        raise ValueError("reclen must be a power of two")
    data_cap = reclen - 64
    out = bytearray()
    seq = 1
    pos = 0
    n = len(samples)
    t = starttime
    while pos < n:
        chunk = samples[pos:]
        if encoding in (ENC_STEIM1, ENC_STEIM2):
            frames = data_cap // 64
            payload, took = _encode_steim(
                np.asarray(chunk, dtype=np.int64), encoding - 9, frames
            )
        else:
            width = {ENC_INT16: 2, ENC_INT32: 4, ENC_FLOAT32: 4, ENC_FLOAT64: 8}[encoding]
            dtype = {ENC_INT16: ">i2", ENC_INT32: ">i4", ENC_FLOAT32: ">f4", ENC_FLOAT64: ">f8"}[encoding]
            took = min(len(chunk), data_cap // width)
            payload = np.asarray(chunk[:took]).astype(dtype).tobytes()
        year, doy, hh, mm, ss, fract = _btime(t)
        header = _HDR.pack(
            f"{seq:06d}".encode(), b"D", b" ",
            station.ljust(5).encode(), location.ljust(2).encode(),
            channel.ljust(3).encode(), network.ljust(2).encode(),
            year, doy, hh, mm, ss, fract,
            took, int(rate), 1,
            0, 0, 0, 1,  # flags ×3, one blockette
            0, 64, 48,
        )
        b1000 = struct.pack(">HHBBBB", 1000, 0, encoding, 1, reclen_exp, 0)
        rec = header + b1000 + b"\x00" * 8 + payload  # data at declared offset 64
        rec += b"\x00" * (reclen - len(rec))
        out += rec
        pos += took
        t += took / rate
        seq += 1
    return bytes(out)


def decode_records(blob: bytes) -> list[TraceSegment]:
    """Decode a MiniSEED blob into per-channel contiguous trace segments
    (record-list decode → merge, reference reading.py:29-68)."""
    pieces: list[dict] = []
    pos = 0
    total = len(blob)
    while pos + 64 <= total:
        # peek blockette 1000 for the record length; header is fixed-size
        (
            _seq, _q, _r, sta, loc, cha, net,
            year, doy, hh, mm, ss, fract,
            nsamp, rfact, rmult,
            _af, _iof, _qf, _nblk, _tcorr, data_off, blk_off,
        ) = _HDR.unpack(blob[pos : pos + 48])
        reclen = None
        encoding = None
        boff = blk_off
        while boff:
            btype, bnext = struct.unpack(">HH", blob[pos + boff : pos + boff + 4])
            if btype == 1000:
                encoding, _wo, rexp, _res = struct.unpack(
                    ">BBBB", blob[pos + boff + 4 : pos + boff + 8]
                )
                reclen = 2**rexp
            boff = bnext
        if reclen is None:
            raise ValueError("record without blockette 1000")
        data = blob[pos + data_off : pos + reclen]
        if encoding in (ENC_STEIM1, ENC_STEIM2):
            arr = _decode_steim(data, nsamp, encoding - 9)
        elif encoding in (ENC_INT16, ENC_INT32, ENC_FLOAT32, ENC_FLOAT64):
            dtype = {ENC_INT16: ">i2", ENC_INT32: ">i4", ENC_FLOAT32: ">f4", ENC_FLOAT64: ">f8"}[encoding]
            width = int(dtype[2])
            arr = np.frombuffer(data[: nsamp * width], dtype=dtype)
        else:
            raise ValueError(f"unsupported encoding {encoding}")
        pieces.append(
            {
                "network": net.decode().strip(),
                "station": sta.decode().strip(),
                "location": loc.decode().strip(),
                "channel": cha.decode().strip(),
                "start": _btime_to_epoch(year, doy, hh, mm, ss, fract),
                "rate": _rate_from_factor(rfact, rmult),
                "samples": arr,
            }
        )
        pos += reclen

    # merge contiguous records per channel (tolerance: half a sample)
    segments: list[TraceSegment] = []
    bykey: dict[tuple, list[dict]] = {}
    for p in pieces:
        key = (p["network"], p["station"], p["location"], p["channel"])
        bykey.setdefault(key, []).append(p)
    for key, parts in bykey.items():
        parts.sort(key=lambda p: p["start"])
        cur: dict | None = None
        for p in parts:
            if cur is not None:
                expected = cur["start"] + len(cur["samples"]) / cur["rate"]
                if abs(p["start"] - expected) <= 0.5 / cur["rate"]:
                    cur["samples"] = np.concatenate([cur["samples"], p["samples"]])
                    continue
                segments.append(TraceSegment(*key, cur["start"], cur["rate"], cur["samples"]))
            cur = dict(p)
        if cur is not None:
            segments.append(TraceSegment(*key, cur["start"], cur["rate"], cur["samples"]))
    return segments
