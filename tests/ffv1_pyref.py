"""Independent pure-Python FFV1 v0/v1 keyframe decoder (test oracle).

A from-the-spec (RFC 9043) reimplementation of the bitstream that
native/ffv1.cpp produces, used by tests/test_ffv1.py to cross-check
the C++ codec through a second implementation: a bug in the C++
decoder that mirrors one in the C++ encoder round-trips silently, but
won't decode here unless this code has the same bug.  Written for
clarity, not speed — decode small frames only.
"""

from __future__ import annotations

import numpy as np

CONTEXT_SIZE = 32


def default_state_tables():
    """The default one/zero state transition tables: the fixed point of
    exponential-decay probability adaptation with factor 0.05 in 32-bit
    fixed point (RFC 9043 section 4.1.3)."""
    one = [0] * 256
    kone = 1 << 32
    factor = 214748364  # trunc(0.05 * 2^32)
    max_p = 256 - 8
    last_p8 = 0
    p = kone // 2
    for _ in range(128):
        p8 = (256 * p + kone // 2) >> 32
        if p8 <= last_p8:
            p8 = last_p8 + 1
        if last_p8 and last_p8 < 256 and p8 <= max_p:
            one[last_p8] = p8
        p += ((kone - p) * factor + kone // 2) >> 32
        last_p8 = p8
    for i in range(256 - max_p, max_p + 1):
        if one[i]:
            continue
        p = (i * kone + 128) >> 8
        p += ((kone - p) * factor + kone // 2) >> 32
        p8 = (256 * p + kone // 2) >> 32
        if p8 <= i:
            p8 = i + 1
        if p8 > max_p:
            p8 = max_p
        one[i] = p8
    zero = [0] * 256
    for i in range(1, 255):
        zero[i] = 256 - one[256 - i]
    return one, zero


ONE_STATE, ZERO_STATE = default_state_tables()


class RangeDecoder:
    """Carry-less binary range decoder (RFC 9043 section 4.1)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.low = int.from_bytes(data[:2].ljust(2, b"\0"), "big")
        self.range = 0xFF00

    def _next(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def get(self, state: bytearray, idx: int) -> int:
        r1 = (self.range * state[idx]) >> 8
        self.range -= r1
        if self.low < self.range:
            state[idx] = ZERO_STATE[state[idx]]
            bit = 0
        else:
            self.low -= self.range
            self.range = r1
            state[idx] = ONE_STATE[state[idx]]
            bit = 1
        if self.range < 0x100:
            self.range <<= 8
            self.low = (self.low << 8) + self._next()
        return bit


def fresh_state() -> bytearray:
    return bytearray([128] * CONTEXT_SIZE)


def get_symbol(c: RangeDecoder, state: bytearray, signed: bool) -> int:
    """Adaptive signed-integer binarization (RFC 9043 section 4.1.5):
    zero flag, unary exponent (states 1..10), mantissa (22..31),
    sign (11..21)."""
    if c.get(state, 0):
        return 0
    e = 0
    while c.get(state, 1 + min(e, 9)):
        e += 1
        if e > 31:
            raise ValueError("corrupt exponent")
    a = 1
    for i in range(e - 1, -1, -1):
        a = (a << 1) | c.get(state, 22 + min(i, 9))
    if signed and c.get(state, 11 + min(e, 10)):
        return -a
    return a


def read_quant_table(c: RangeDecoder, scale: int):
    """Run-coded quantization table halves, mirrored negative
    (RFC 9043 section 4.2.6); returns (256-entry table, distinct)."""
    state = fresh_state()
    table = [0] * 256
    i = 0
    v = 0
    while i < 128:
        run = get_symbol(c, state, False) + 1
        if run > 128 - i:
            raise ValueError("quant run overflow")
        for _ in range(run):
            table[i] = scale * v
            i += 1
        v += 1
    for j in range(1, 128):
        table[256 - j] = -table[j]
    table[128] = -table[127]
    return table, 2 * v - 1


def decode_keyframe(packet: bytes, width: int, height: int):
    """Decode one v0/v1 keyframe; returns (params dict, [planes])."""
    c = RangeDecoder(packet)
    keystate = bytearray([128])
    if not c.get(keystate, 0):
        raise ValueError("not a keyframe")
    state = fresh_state()
    version = get_symbol(c, state, False)
    if version > 1:
        raise ValueError(f"version {version} needs extradata")
    coder = get_symbol(c, state, False)
    if coder != 1:
        raise ValueError("only the default-table range coder")
    colorspace = get_symbol(c, state, False)
    if colorspace != 0:
        raise ValueError("only YCbCr/gray")
    bits = get_symbol(c, state, False) if version > 0 else 8
    chroma_planes = c.get(state, 0)
    h_shift = get_symbol(c, state, False)
    v_shift = get_symbol(c, state, False)
    transparency = c.get(state, 0)
    quant = []
    context_count = 1
    for _ in range(5):
        t, n = read_quant_table(c, context_count)
        quant.append(t)
        context_count *= n
    contexts = (context_count + 1) // 2
    five = quant[3][127] != 0 or quant[4][127] != 0

    def plane_dims(p):
        if chroma_planes and p in (1, 2):
            return ((width + (1 << h_shift) - 1) >> h_shift,
                    (height + (1 << v_shift) - 1) >> v_shift)
        return width, height

    wrap16 = bits == 16  # samples code through wrapped signed-16
    nplanes = 1 + (2 if chroma_planes else 0) + (1 if transparency else 0)
    # context sets: luma 0, chroma shared 1, alpha 2
    sets = [bytearray([128] * (contexts * CONTEXT_SIZE)) for _ in range(3)]
    mask = (1 << bits) - 1
    planes = []
    for p in range(nplanes):
        w, h = plane_dims(p)
        cs = 1 if (chroma_planes and p in (1, 2)) else (2 if p >= 1 else 0)
        states = sets[cs]
        plane = np.zeros((h, w), np.int64)
        # three-row ring with guard semantics: top rows zero, left
        # border = sample above, right border repeats the last column
        rows = [np.zeros(w + 6, np.int64) for _ in range(3)]

        def at(row, x):
            return int(row[x + 3])

        for y in range(h):
            rows = [rows[2], rows[0], rows[1]]  # rotate: rows[0] current
            cur, above, above2 = rows
            cur[3 - 1] = above[3 + 0]              # left border
            above[3 + w] = above[3 + w - 1]        # right border
            for x in range(w):
                l_, lt = at(cur, x - 1), at(above, x - 1)
                t_, rt = at(above, x), at(above, x + 1)
                ctx = (quant[0][(l_ - lt) & 0xFF] + quant[1][(lt - t_) & 0xFF]
                       + quant[2][(t_ - rt) & 0xFF])
                if five:
                    ctx += (quant[3][(at(cur, x - 2) - l_) & 0xFF]
                            + quant[4][(at(above2, x) - t_) & 0xFF])
                sign = ctx < 0
                if sign:
                    ctx = -ctx
                base = ctx * CONTEXT_SIZE
                view = memoryview(states)[base:base + CONTEXT_SIZE]
                st = bytearray(view)
                diff = get_symbol(c, st, True)
                view[:] = st
                if sign:
                    diff = -diff
                predict = sorted((l_, l_ + t_ - lt, t_))[1]
                v = (predict + diff) & mask
                if wrap16 and v >= 0x8000:
                    v -= 0x10000
                cur[x + 3] = v
            plane[y] = cur[3:3 + w] & mask
        planes.append(plane.astype(np.uint16 if bits > 8 else np.uint8))
    params = dict(version=version, bits=bits, chroma_planes=chroma_planes,
                  h_shift=h_shift, v_shift=v_shift,
                  transparency=transparency, contexts=contexts)
    return params, planes


class RangeEncoder:
    """Minimal encoder counterpart (for crafting test bitstreams)."""

    def __init__(self):
        self.out = bytearray()
        self.low = 0
        self.range = 0xFF00
        self.outstanding_count = 0
        self.outstanding_byte = -1

    def _renorm(self):
        while self.range < 0x100:
            if self.outstanding_byte < 0:
                self.outstanding_byte = self.low >> 8
            elif self.low <= 0xFF00:
                self.out.append(self.outstanding_byte)
                self.out.extend(b"\xff" * self.outstanding_count)
                self.outstanding_count = 0
                self.outstanding_byte = self.low >> 8
            elif self.low >= 0x10000:
                self.out.append(self.outstanding_byte + 1)
                self.out.extend(b"\x00" * self.outstanding_count)
                self.outstanding_count = 0
                self.outstanding_byte = (self.low >> 8) & 0xFF
            else:
                self.outstanding_count += 1
            self.low = (self.low & 0xFF) << 8
            self.range <<= 8

    def put(self, state: bytearray, idx: int, bit: int) -> None:
        r1 = (self.range * state[idx]) >> 8
        if bit:
            self.low += self.range - r1
            self.range = r1
            state[idx] = ONE_STATE[state[idx]]
        else:
            self.range -= r1
            state[idx] = ZERO_STATE[state[idx]]
        self._renorm()

    def put_symbol(self, state: bytearray, v: int, signed: bool) -> None:
        if not v:
            self.put(state, 0, 1)
            return
        a = abs(v)
        e = a.bit_length() - 1
        self.put(state, 0, 0)
        for i in range(e):
            self.put(state, 1 + min(i, 9), 1)
        self.put(state, 1 + min(e, 9), 0)
        for i in range(e - 1, -1, -1):
            self.put(state, 22 + min(i, 9), (a >> i) & 1)
        if signed:
            self.put(state, 11 + min(e, 10), int(v < 0))

    def terminate(self) -> bytes:
        self.range = 0xFF
        self.low += 0xFF
        self._renorm()
        self.range = 0xFF
        self._renorm()
        if self.outstanding_byte >= 0:
            self.out.append(self.outstanding_byte)
            self.out.extend(b"\xff" * self.outstanding_count)
        self.out.append(0)
        return bytes(self.out)
