"""Arithmetic coder for the native LAZ codec (LASzip coding layer).

Implements the adaptive arithmetic coder LASzip uses — Amir Said's FastAC
(published in "Introduction to Arithmetic Coding - Theory and Practice",
HPL-2004-76, and as open-source FastAC; adopted verbatim by LASzip's
``arithmeticencoder/decoder.cpp``).  The renormalization constants,
model-update schedule, and bit/symbol model layouts follow that public
specification so streams interoperate with conforming LASzip readers.

Pure Python with table-driven adaptive models: the coder runs inside
executor tasks per LAZ chunk (50 000 points), mirroring the reference's
per-chunk decode parallelism (``pc-io/src/las/source.rs:159-208``).
Python-loop speed is the documented cost of a dependency-free vendored
codec — the scale path fans chunks across the cluster, and ingest is a
one-time ELT job (SURVEY.md §2.1).
"""

from __future__ import annotations

AC_MIN_LENGTH = 0x0100_0000
AC_MAX_LENGTH = 0xFFFF_FFFF
_U32 = 0xFFFF_FFFF

DM_LENGTH_SHIFT = 15
DM_MAX_COUNT = 1 << DM_LENGTH_SHIFT
BM_LENGTH_SHIFT = 13
BM_MAX_COUNT = 1 << BM_LENGTH_SHIFT


class ArithmeticModel:
    """Adaptive multi-symbol model (FastAC ``Adaptive_Data_Model``)."""

    __slots__ = ("symbols", "distribution", "symbol_count", "total_count",
                 "update_cycle", "symbols_until_update", "last_symbol")

    def __init__(self, symbols: int):
        self.symbols = symbols
        self.last_symbol = symbols - 1
        self.symbol_count = [1] * symbols
        self.distribution = [0] * symbols
        self.total_count = 0
        # first update must account the initial 1-per-symbol counts, so the
        # pre-update cycle is `symbols` — an undercounted total overflows
        # the 15-bit distribution budget and corrupts interval nesting
        self.update_cycle = symbols
        self._update()
        self.update_cycle = (symbols + 6) >> 1
        self.symbols_until_update = self.update_cycle

    def _update(self) -> None:
        self.total_count += self.update_cycle
        if self.total_count > DM_MAX_COUNT:
            self.total_count = 0
            for n in range(self.symbols):
                self.symbol_count[n] = (self.symbol_count[n] + 1) >> 1
                self.total_count += self.symbol_count[n]
        scale = 0x8000_0000 // self.total_count
        s = 0
        shift = 31 - DM_LENGTH_SHIFT
        dist = self.distribution
        cnt = self.symbol_count
        for k in range(self.symbols):
            dist[k] = (scale * s) >> shift
            s += cnt[k]
        self.update_cycle = (5 * self.update_cycle) >> 2
        max_cycle = (self.symbols + 6) << 3
        if self.update_cycle > max_cycle:
            self.update_cycle = max_cycle
        self.symbols_until_update = self.update_cycle


class ArithmeticBitModel:
    """Adaptive binary model (FastAC ``Adaptive_Bit_Model``)."""

    __slots__ = ("bit_0_count", "bit_count", "bit_0_prob", "update_cycle", "bits_until_update")

    def __init__(self):
        self.bit_0_count = 1
        self.bit_count = 2
        self.bit_0_prob = 1 << (BM_LENGTH_SHIFT - 1)
        self.update_cycle = 4
        self.bits_until_update = 4

    def _update(self) -> None:
        self.bit_count += self.update_cycle
        if self.bit_count > BM_MAX_COUNT:
            self.bit_count = (self.bit_count + 1) >> 1
            self.bit_0_count = (self.bit_0_count + 1) >> 1
            if self.bit_0_count == self.bit_count:
                self.bit_count += 1
        self.bit_0_prob = (self.bit_0_count << BM_LENGTH_SHIFT) // self.bit_count
        self.update_cycle = (5 * self.update_cycle) >> 2
        if self.update_cycle > 64:
            self.update_cycle = 64
        self.bits_until_update = self.update_cycle


class ArithmeticEncoder:
    def __init__(self):
        self.base = 0
        self.length = AC_MAX_LENGTH
        self.out = bytearray()

    def _propagate_carry(self) -> None:
        p = len(self.out) - 1
        while p >= 0 and self.out[p] == 0xFF:
            self.out[p] = 0
            p -= 1
        # a carry out of the first byte cannot occur for a properly
        # initialized coder (base starts at 0)
        self.out[p] += 1

    def _renorm(self) -> None:
        while True:
            self.out.append((self.base >> 24) & 0xFF)
            self.base = (self.base << 8) & _U32
            self.length = (self.length << 8) & _U32
            if self.length >= AC_MIN_LENGTH:
                break

    def encode_bit(self, m: ArithmeticBitModel, bit: int) -> None:
        x = m.bit_0_prob * (self.length >> BM_LENGTH_SHIFT)
        if bit:
            init_base = self.base
            self.base = (self.base + x) & _U32
            if init_base > self.base:
                self._propagate_carry()
            self.length -= x
        else:
            self.length = x
            m.bit_0_count += 1
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m._update()

    def encode_symbol(self, m: ArithmeticModel, sym: int) -> None:
        init_base = self.base
        if sym == m.last_symbol:
            x = m.distribution[sym] * (self.length >> DM_LENGTH_SHIFT)
            self.base = (self.base + x) & _U32
            self.length -= x
        else:
            self.length >>= DM_LENGTH_SHIFT
            x = m.distribution[sym] * self.length
            self.base = (self.base + x) & _U32
            self.length = m.distribution[sym + 1] * self.length - x
        if init_base > self.base:
            self._propagate_carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m._update()

    def write_bits(self, bits: int, value: int) -> None:
        """Raw (equiprobable) bits.  >19-bit writes split LASzip's way:
        LOW 16 bits first, then the high remainder."""
        if bits > 19:
            self.write_bits(16, value & 0xFFFF)
            self.write_bits(bits - 16, value >> 16)
            return
        init_base = self.base
        self.length >>= bits
        x = value * self.length
        self.base = (self.base + x) & _U32
        if init_base > self.base:
            self._propagate_carry()
        if self.length < AC_MIN_LENGTH:
            self._renorm()

    def done(self) -> bytes:
        init_base = self.base
        if self.length > 2 * AC_MIN_LENGTH:
            self.base = (self.base + AC_MIN_LENGTH) & _U32
            self.length = AC_MIN_LENGTH >> 1
        else:
            self.base = (self.base + (AC_MIN_LENGTH >> 1)) & _U32
            self.length = AC_MIN_LENGTH >> 9
        if init_base > self.base:
            self._propagate_carry()
        self._renorm()
        return bytes(self.out)


class ArithmeticDecoder:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.value = 0
        for _ in range(4):
            self.value = ((self.value << 8) | self._in_byte()) & _U32
        self.length = AC_MAX_LENGTH

    def _in_byte(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def _renorm(self) -> None:
        while True:
            self.value = ((self.value << 8) | self._in_byte()) & _U32
            self.length = (self.length << 8) & _U32
            if self.length >= AC_MIN_LENGTH:
                break

    def decode_bit(self, m: ArithmeticBitModel) -> int:
        x = m.bit_0_prob * (self.length >> BM_LENGTH_SHIFT)
        if self.value < x:
            bit = 0
            self.length = x
            m.bit_0_count += 1
        else:
            bit = 1
            self.value -= x
            self.length -= x
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m._update()
        return bit

    def decode_symbol(self, m: ArithmeticModel) -> int:
        y = self.length
        # binary search over the cumulative distribution (FastAC's
        # multiplication-only path; LASzip builds decoder tables for big
        # models — same results, this is the simpler exact variant)
        self.length >>= DM_LENGTH_SHIFT
        dist = m.distribution
        x = 0
        sym = 0
        n = m.symbols
        k = n >> 1
        while k != sym:
            z = self.length * dist[k]
            if z > self.value:
                n = k
                y = z
            else:
                sym = k
                x = z
            k = (sym + n) >> 1
        self.value -= x
        self.length = y - x
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m._update()
        return sym

    def read_bits(self, bits: int) -> int:
        if bits > 19:
            lo = self.read_bits(16)
            hi = self.read_bits(bits - 16)
            return (hi << 16) | lo
        self.length >>= bits
        sym = self.value // self.length
        self.value -= sym * self.length
        if self.length < AC_MIN_LENGTH:
            self._renorm()
        return sym


# --- LASzip IntegerCompressor ----------------------------------------------


class IntegerCompressor:
    """LASzip ``IntegerCompressor``: codes a signed corrector relative to
    a prediction as (k, k-bit remainder), with adaptive models for k and
    for the low-entropy remainders (``integercompressor.cpp`` layout:
    ``bits_high`` splits big remainders into a modeled high part and raw
    low bits)."""

    def __init__(self, bits: int = 16, contexts: int = 1, bits_high: int = 8):
        self.bits = bits
        self.contexts = contexts
        self.bits_high = bits_high
        if bits and bits < 32:
            self.corr_bits = bits
            self.corr_range = 1 << bits
            self.corr_min = -(self.corr_range >> 1)
            self.corr_max = self.corr_min + self.corr_range - 1
        else:
            self.corr_bits = 32
            self.corr_range = 0  # overflow sentinel: full 32-bit wrap
            self.corr_min = -0x7FFF_FFFF
            self.corr_max = 0x7FFF_FFFF
        self.m_bits = [ArithmeticModel(self.corr_bits + 1) for _ in range(contexts)]
        self.m_corrector0 = ArithmeticBitModel()
        self.m_corrector = [None] + [
            ArithmeticModel(1 << (k if k <= bits_high else bits_high))
            for k in range(1, self.corr_bits + 1)
        ]
        self.k = 0  # number of bits of the last coded corrector (context feed)

    # -- encode --

    def compress(self, enc: ArithmeticEncoder, pred: int, real: int, context: int = 0) -> None:
        corr = real - pred
        if self.corr_range:
            if corr < self.corr_min:
                corr += self.corr_range
            elif corr > self.corr_max:
                corr -= self.corr_range
        else:  # 32-bit wrap
            corr = ((corr + 0x8000_0000) & _U32) - 0x8000_0000
        self._write_corrector(enc, corr, self.m_bits[context])

    def _write_corrector(self, enc: ArithmeticEncoder, c: int, m_bits: ArithmeticModel) -> None:
        # interval number k: c==0/1 -> k=0; else 2^(k-1) <= (c<=0 ? -c : c-1) < 2^k
        c1 = -c if c <= 0 else c - 1
        k = c1.bit_length()
        self.k = k
        enc.encode_symbol(m_bits, k)
        if k:
            if k < 32:
                # translate c into [0, 2^k - 1]: positives [2^(k-1)+1, 2^k]
                # land in the upper half, negatives [-(2^k-1), -2^(k-1)]
                # in the lower half
                if c >= 0:
                    c -= 1
                else:
                    c += (1 << k) - 1
                if k <= self.bits_high:
                    enc.encode_symbol(self.m_corrector[k], c)
                else:
                    k1 = k - self.bits_high
                    enc.encode_symbol(self.m_corrector[k], c >> k1)
                    enc.write_bits(k1, c & ((1 << k1) - 1))
        else:
            enc.encode_bit(self.m_corrector0, c)

    # -- decode --

    def decompress(self, dec: ArithmeticDecoder, pred: int, context: int = 0) -> int:
        real = pred + self._read_corrector(dec, self.m_bits[context])
        if self.corr_range:
            if real < 0:
                real += self.corr_range
            elif real >= self.corr_range:
                real -= self.corr_range
        else:
            real = ((real + 0x8000_0000) & _U32) - 0x8000_0000
        return real

    def _read_corrector(self, dec: ArithmeticDecoder, m_bits: ArithmeticModel) -> int:
        k = dec.decode_symbol(m_bits)
        self.k = k
        if k:
            if k < 32:
                if k <= self.bits_high:
                    c = dec.decode_symbol(self.m_corrector[k])
                else:
                    k1 = k - self.bits_high
                    c = dec.decode_symbol(self.m_corrector[k])
                    c = (c << k1) | dec.read_bits(k1)
                # translate back out of [0, 2^k - 1]
                if c >= (1 << (k - 1)):
                    c += 1  # upper half -> positive [2^(k-1)+1, 2^k]
                else:
                    c -= (1 << k) - 1  # lower half -> negative
                return c
            return self.corr_min
        return dec.decode_bit(self.m_corrector0)
