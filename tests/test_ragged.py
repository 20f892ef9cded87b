import numpy as np

from genozip_tpu.utils import ragged
from genozip_tpu.utils.ragged import Col


def test_from_list_roundtrip():
    rows = [b"hello", b"", b"x", b"worlds!"]
    c = Col.from_list(rows)
    assert c.to_list() == rows


def test_gather_and_take():
    data = np.frombuffer(b"abcdefghij", np.uint8)
    c = ragged.gather_ranges(data, np.array([0, 5, 2]), np.array([3, 5, 0]))
    assert c.to_list() == [b"abc", b"fghij", b""]
    t = ragged.take(c, np.array([2, 0, 0]))
    assert t.to_list() == [b"", b"abc", b"abc"]


def test_interleave():
    a = Col.from_list([b"r1", b"r2xx"])
    b = Col.from_list([b"ACGT", b"GG"])
    out = ragged.interleave([a, b], sep_after=[b"\t", b"\n"])
    assert out.to_list() == [b"r1\tACGT\n", b"r2xx\tGG\n"]


def test_split_fields_fixed():
    lines = Col.from_list([b"a\tbb\tccc", b"\tx\t"])
    f = ragged.split_fields_fixed(lines, ord("\t"), 3)
    assert f[0].to_list() == [b"a", b""]
    assert f[1].to_list() == [b"bb", b"x"]
    assert f[2].to_list() == [b"ccc", b""]


def test_atoi_itoa():
    vals = np.array([0, 1, -1, 123456789012345, -987, 10, 999999])
    col = ragged.itoa(vals)
    assert col.to_list() == [str(v).encode() for v in vals]
    back, ok = ragged.atoi(col)
    assert ok.all()
    assert (back == vals).all()
    bad = Col.from_list([b"12a", b"", b"007", b"-", b"--3", b"5"])
    v, ok = ragged.atoi(bad)
    assert list(ok) == [False, False, False, False, False, True]
    assert v[5] == 5
