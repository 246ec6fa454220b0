"""LZO1X decompressor conformance (VERDICT r5 missing-#3 closure).

No lzo library exists in this environment, so the pins are (a)
roundtrips through the module's literal-only compressor — which emits
streams any conformant decompressor accepts, covering the first-byte
and extended-run literal encodings — and (b) HAND-BUILT byte vectors
for every match opcode family, assembled instruction-by-instruction
from the published bitstream (the same golden-fixture discipline as
``test_nffile.py``: the expected output is computed by hand from the
spec, never by the code under test).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nfdump2clickhouse_spark.sources import lzo1x

EOS = b"\x11\x00\x00"
MAX = 1 << 20


# --- roundtrips (literal encodings + EOS) ------------------------------------


@pytest.mark.parametrize("n", [0, 1, 2, 3, 4, 17, 18, 19, 237, 238, 239,
                               255, 273, 274, 300, 4096, 100_000])
def test_roundtrip_sizes(n):
    data = bytes((7 * i + 3) % 256 for i in range(n))
    assert lzo1x.decompress(lzo1x.compress(data), MAX) == data


@settings(max_examples=120, deadline=None)
@given(data=st.binary(max_size=2000))
def test_roundtrip_fuzz(data):
    assert lzo1x.decompress(lzo1x.compress(data), MAX) == data


# --- hand-built match-opcode vectors -----------------------------------------
# Each stream is packed by hand from the documented instruction set;
# the expected bytes are derived on paper, so these pin the DECODER's
# conformance independently of the module's own compressor.


def test_m2_long_match_with_trailing_literal():
    """[lit 'abc'] + M2 (1 L L D D D S S): length 5+1=6, dist
    (0<<3)+2+1=3, S=1 trailing literal 'd' -> 'abcabcabcd'."""
    s = bytes([20]) + b"abc" + bytes([0b10101001, 0x00]) + b"d" + EOS
    assert lzo1x.decompress(s, MAX) == b"abcabcabcd"


def test_m2_short_match():
    """[lit 'abcd'] + M2 short (0 1 L D D D S S): length 3+0=3, dist
    (0<<3)+3+1=4 -> copies 'abc'."""
    s = bytes([21]) + b"abcd" + bytes([0b01001100, 0x00]) + EOS
    assert lzo1x.decompress(s, MAX) == b"abcdabc"


def test_two_byte_match_after_short_literal():
    """Initial literal 'ab' leaves state=2, so opcode<16 is the 2-byte
    1kB match: dist (0<<2)+1+1=2, length 2 -> 'abab'."""
    s = bytes([19]) + b"ab" + bytes([0b00000100, 0x00]) + EOS
    assert lzo1x.decompress(s, MAX) == b"abab"


def test_three_byte_match_after_long_literal():
    """Long literal run (state=4): opcode<16 is the 2049-base 3-byte
    match. 2060 a's via the opcode-0 extension (18+255*8+2), then
    dist (0<<2)+0+2049=2049, length 3 -> 2063 a's."""
    s = bytes([0]) + b"\x00" * 8 + bytes([2]) + b"a" * 2060 \
        + bytes([0, 0]) + EOS
    assert lzo1x.decompress(s, MAX) == b"a" * 2063


def test_m3_match():
    """[lit 'abcdefgh'] + M3 (0 0 1 L L L L L): length 2+3=5, LE16
    dist = (28>>2)+1 = 8, S = 28&3 = 0 -> copies 'abcde'."""
    s = bytes([25]) + b"abcdefgh" + bytes([35, 28, 0]) + EOS
    assert lzo1x.decompress(s, MAX) == b"abcdefghabcde"


def test_m4_match_beyond_16k():
    """17000 a's (extension literal), then M4 (0 0 0 1 H L L L):
    t=0x11, LE16=4 -> dist 16384+(4>>2)=16385 (NOT the EOS 16384),
    length 2+1=3 -> 17003 a's."""
    rem = 17000 - 18
    z, nz = divmod(rem, 255)
    if nz == 0:
        z, nz = z - 1, 255
    s = bytes([0]) + b"\x00" * z + bytes([nz]) + b"a" * 17000 \
        + bytes([0x11, 0x04, 0x00]) + EOS
    assert lzo1x.decompress(s, MAX) == b"a" * 17003


def test_overlapping_match_is_pattern_repetition():
    """[lit 'ab'] + M2 long: length 5+3=8, dist 2 -> the copy repeats
    the 2-byte pattern: 'ab'*5."""
    s = bytes([19]) + b"ab" + bytes([0b11100100, 0x00]) + EOS
    assert lzo1x.decompress(s, MAX) == b"ab" * 5


def test_m3_length_extension():
    """M3 with L=0 + extension byte: length 2+31+4=37 from dist 1 ->
    'a' + 37 a's."""
    s = bytes([18]) + b"a" + bytes([32, 4, 0, 0]) + EOS
    assert lzo1x.decompress(s, MAX) == b"a" * 38


def test_empty_stream_is_just_eos():
    assert lzo1x.decompress(EOS, MAX) == b""


# --- totality ---------------------------------------------------------------


def test_malformed_raises_lzo_error():
    for bad in [b"", b"\x11", b"\x12abc", bytes([19]) + b"ab",
                bytes([19]) + b"ab" + bytes([0b00001000, 0x00]) + EOS,
                bytes([0]) + b"\x00" * 4]:
        with pytest.raises(lzo1x.LzoError):
            lzo1x.decompress(bad, MAX)


def test_match_before_any_output_raises():
    # M2 at stream start refers to history that does not exist
    with pytest.raises(lzo1x.LzoError):
        lzo1x.decompress(bytes([0b10101001, 0x00]) + EOS, MAX)


def test_max_out_is_enforced():
    data = b"x" * 1000
    with pytest.raises(lzo1x.LzoError):
        lzo1x.decompress(lzo1x.compress(data), 100)


def test_max_out_enforced_on_initial_literal_run():
    """The first-byte>17 initial literal run must honor max_out too —
    it is an output-growing path like any other (ADVICE r6)."""
    s = bytes([17 + 8]) + b"abcdefgh" + EOS
    assert lzo1x.decompress(s, 8) == b"abcdefgh"
    with pytest.raises(lzo1x.LzoError):
        lzo1x.decompress(s, 4)


@settings(max_examples=200, deadline=None)
@given(junk=st.binary(max_size=400))
def test_junk_never_hangs_or_overreads(junk):
    """Arbitrary bytes either raise LzoError or decode to some bytes
    within max_out — never crash, never loop forever."""
    try:
        out = lzo1x.decompress(junk, 4096)
    except lzo1x.LzoError:
        return
    assert isinstance(out, bytes) and len(out) <= 4096
