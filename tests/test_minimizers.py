import numpy as np

from hylight_tpu.io.readset import ReadSet, encode_seq, revcomp_codes
from hylight_tpu.ops.minimizers import minimizers, reference_minimizers


def _run(seqs_list, k=5, w=4, cap=64):
    rs = ReadSet.from_seqs(seqs_list)
    padded, lens = rs.to_padded()
    return minimizers(padded, lens, k=k, w=w, cap=cap)


def test_matches_reference_impl(rng):
    seqs = [rng.integers(0, 4, size=int(n)).astype(np.uint8)
            for n in rng.integers(20, 200, size=10)]
    # sprinkle Ns
    seqs[3][5:9] = 4
    ms = _run(seqs, k=5, w=4, cap=128)
    for i, s in enumerate(seqs):
        ref = reference_minimizers(s, 5, 4)
        got = set()
        for j in range(int(ms.count[i])):
            got.add((int(ms.pos[i, j]), int(ms.strand[i, j]),
                     int(ms.hash[i, j])))
        assert got == ref, f"read {i}"


def test_revcomp_invariance(rng):
    """Canonical minimizer hashes of a read and its revcomp must coincide."""
    s = rng.integers(0, 4, size=150).astype(np.uint8)
    r = revcomp_codes(s)
    m1 = _run([s], k=7, w=5)
    m2 = _run([r], k=7, w=5)
    h1 = sorted(int(h) for h in m1.hash[0][: int(m1.count[0])])
    h2 = sorted(int(h) for h in m2.hash[0][: int(m2.count[0])])
    assert h1 == h2


def test_positions_within_read():
    s = encode_seq("ACGTACGTTGCAGT" * 10)
    ms = _run([s], k=5, w=3, cap=256)
    c = int(ms.count[0])
    assert c > 0
    p = np.array(ms.pos[0][:c])
    assert (p >= 0).all() and (p + 5 <= len(s)).all()
    # invalid slots stay sentinel
    assert (np.array(ms.pos[0][c:]) == -1).all()


def test_cap_saturation(rng):
    s = rng.integers(0, 4, size=500).astype(np.uint8)
    ms = _run([s], k=5, w=2, cap=8)
    assert int(ms.count[0]) == 8


def test_n_blocks_no_minimizers():
    s = np.full(100, 4, dtype=np.uint8)
    ms = _run([s])
    assert int(ms.count[0]) == 0
