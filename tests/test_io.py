import numpy as np
import pytest

from hylight_tpu.io import ReadSet, read_fastx, write_fasta, write_fastq
from hylight_tpu.io.readset import decode_seq, encode_seq, revcomp_codes


def test_encode_decode_roundtrip():
    s = "ACGTNacgtXn"
    codes = encode_seq(s)
    assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4]
    assert decode_seq(codes) == "ACGTNACGTNN"


def test_revcomp():
    assert decode_seq(revcomp_codes(encode_seq("ACGTN"))) == "NACGT"


def test_readset_basics():
    rs = ReadSet.from_seqs(["ACGT", "GG", "TTTTT"], names=["a", "b", "c"])
    assert rs.n == 3
    assert rs.lengths.tolist() == [4, 2, 5]
    assert rs.get_str(1) == "GG"
    sub = rs.subset([2, 0])
    assert sub.get_str(0) == "TTTTT" and sub.names == ["c", "a"]
    padded, lens = rs.to_padded()
    assert padded.shape == (3, 128)
    assert (padded[0, :4] == encode_seq("ACGT")).all()
    assert (padded[0, 4:] == 4).all()
    assert lens.tolist() == [4, 2, 5]


def test_fasta_roundtrip(tmp_path):
    rs = ReadSet.from_seqs(["ACGTACGT", "GGCC"], names=["r1", "r2"])
    p = str(tmp_path / "x.fa")
    write_fasta(p, rs, wrap=3)
    back = read_fastx(p)
    assert back.n == 2
    assert back.get_str(0) == "ACGTACGT"
    assert back.names == ["r1", "r2"]


def test_fastq_roundtrip(tmp_path):
    q = [np.array([30, 31, 32, 33], dtype=np.uint8),
         np.array([2, 2], dtype=np.uint8)]
    rs = ReadSet.from_seqs(["ACGT", "NN"], quals=q, names=["a/1", "a/2"])
    p = str(tmp_path / "x.fq")
    write_fastq(p, rs)
    back = read_fastx(p)
    assert back.get_str(0) == "ACGT"
    assert back.get_qual(0).tolist() == [30, 31, 32, 33]
    assert back.names == ["a/1", "a/2"]


def test_name_truncation_and_sanitize(tmp_path):
    p = str(tmp_path / "y.fa")
    with open(p, "w") as f:
        f.write(">read1 extra stuff\nacgtX\n>read2\nNNNN\n")
    rs = read_fastx(p)
    assert rs.names == ["read1", "read2"]
    assert rs.get_str(0) == "ACGTN"


def test_native_parser_matches_python(tmp_path):
    pytest.importorskip("ctypes")
    from hylight_tpu import native
    lib = native.load()
    if lib is None:
        pytest.skip("native lib unavailable")
    p = str(tmp_path / "z.fq")
    with open(p, "w") as f:
        for i in range(50):
            f.write(f"@r{i} comment\n" + "ACGTN" * (i + 1) + "\n+\n"
                    + "I" * (5 * (i + 1)) + "\n")
    rs_native = native.parse_fastx_native(p, "fastq", True)
    assert rs_native is not None
    # force python fallback for comparison
    import hylight_tpu.io.fastx as fastx_mod
    import hylight_tpu.native as native_mod
    orig = native_mod.parse_fastx_native
    native_mod.parse_fastx_native = lambda *a, **k: None
    try:
        rs_py = fastx_mod.read_fastx(p)
    finally:
        native_mod.parse_fastx_native = orig
    assert rs_native.n == rs_py.n
    assert (rs_native.seq == rs_py.seq).all()
    assert (rs_native.offsets == rs_py.offsets).all()
    assert (rs_native.qual == rs_py.qual).all()
    assert rs_native.names == rs_py.names
