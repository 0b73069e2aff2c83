import numpy as np

from hylight_tpu.io.readset import ReadSet, revcomp_codes
from hylight_tpu.ops.minimizers import minimizers
from hylight_tpu.overlap.seed import (build_index, collect_anchors,
                                      group_candidates, self_join_candidates)

K, W = 11, 5


def _candidates(seqs, dedup_self=True, min_anchors=4, bandwidth=64):
    rs = ReadSet.from_seqs(seqs)
    padded, lens = rs.to_padded()
    cap = max(64, (padded.shape[1] * 2) // (W + 1) + 32)
    ms = minimizers(padded, lens, k=K, w=W, cap=cap)
    idx = build_index(ms, 0, max_occ=16)
    anchors = collect_anchors(ms, 0, idx, max_hits=16,
                              dedup_self=dedup_self)
    import jax.numpy as jnp
    return group_candidates(anchors, jnp.asarray(lens), bandwidth=bandwidth,
                            min_anchors=min_anchors, max_pairs=64,
                            anchors_per_pair=128, k=K,
                            row_size=cap * 16)


def _valid_pairs(c):
    out = {}
    v = np.array(c.valid)
    for i in np.nonzero(v)[0]:
        out[(int(c.qid[i]), int(c.tid[i]))] = dict(
            strand=int(c.strand[i]), n=int(c.n_anchors[i]),
            aq=np.array(c.aq[i])[np.array(c.amask[i])],
            at=np.array(c.at[i])[np.array(c.amask[i])],
        )
    return out


def test_forward_overlap_detected(rng):
    g = rng.integers(0, 4, size=800).astype(np.uint8)
    r1, r2 = g[:500], g[300:800]     # 200 bp dovetail overlap
    pairs = _valid_pairs(_candidates([r1, r2]))
    assert (0, 1) in pairs
    p = pairs[(0, 1)]
    assert p["strand"] == 0 and p["n"] >= 4
    # anchors must live in the overlap region and lie on diagonal ~300
    assert (p["aq"] >= 290).all()
    diag = p["aq"] - p["at"]
    assert (np.abs(diag - 300) < 64 + 1).all()


def test_revcomp_overlap_detected(rng):
    g = rng.integers(0, 4, size=800).astype(np.uint8)
    r1 = g[:500]
    r2 = revcomp_codes(g[300:800])
    pairs = _valid_pairs(_candidates([r1, r2]))
    assert (0, 1) in pairs
    assert pairs[(0, 1)]["strand"] == 1


def test_no_overlap_no_candidate(rng):
    r1 = rng.integers(0, 4, size=400).astype(np.uint8)
    r2 = rng.integers(0, 4, size=400).astype(np.uint8)
    pairs = _valid_pairs(_candidates([r1, r2]))
    assert (0, 1) not in pairs


def test_dedup_self_halves_pairs(rng):
    g = rng.integers(0, 4, size=600).astype(np.uint8)
    pairs = _valid_pairs(_candidates([g[:400], g[200:600]], dedup_self=False))
    # without dedup both orders appear
    assert (0, 1) in pairs and (1, 0) in pairs


def test_contained_read_detected(rng):
    g = rng.integers(0, 4, size=1000).astype(np.uint8)
    pairs = _valid_pairs(_candidates([g, g[200:500]]))
    assert (0, 1) in pairs


def test_indel_drift_band_merge(rng):
    """5% indels drift the diagonal; neighbor-band merging must still find it."""
    g = rng.integers(0, 4, size=2000).astype(np.uint8)
    r1 = g[:1400]
    # corrupt the shared region with deletions (drifts diagonal by ~50)
    keep = rng.random(1400) > 0.05
    r2 = np.concatenate([g[600:2000][keep[: 1400]],])
    pairs = _valid_pairs(_candidates([r1, r2], bandwidth=64, min_anchors=4))
    assert (0, 1) in pairs


def _candidates_selfjoin(seqs, min_anchors=4, bandwidth=64):
    import jax.numpy as jnp
    rs = ReadSet.from_seqs(seqs)
    padded, lens = rs.to_padded()
    cap = max(64, (padded.shape[1] * 2) // (W + 1) + 32)
    ms = minimizers(padded, lens, k=K, w=W, cap=cap)
    idx = build_index(ms, 0, max_occ=16)
    return self_join_candidates(idx, jnp.asarray(lens).astype(jnp.int32),
                                bandwidth=bandwidth,
                                min_anchors=min_anchors, max_pairs=64,
                                anchors_per_pair=128, max_occ=16, k=K,
                                n_reads=len(seqs),
                                max_len=int(padded.shape[1]))


def test_self_join_matches_legacy_path():
    rng = np.random.default_rng(106)
    """The roll-based self-join must produce the same candidate pairs and
    anchor windows as collect_anchors(dedup_self) + group_candidates."""
    g = rng.integers(0, 4, size=4000).astype(np.uint8)
    reads = [g[s:s + 900].copy() for s in range(0, 3101, 200)]
    # sprinkle errors + one revcomp read
    for r in reads[::3]:
        p = rng.integers(0, len(r), 6)
        r[p] = (r[p] + 1) % 4
    reads[5] = revcomp_codes(reads[5])
    old = _valid_pairs(_candidates(reads, min_anchors=4))
    new = _valid_pairs(_candidates_selfjoin(reads, min_anchors=4))
    assert set(old) == set(new), (set(old) ^ set(new))
    for key in old:
        assert old[key]["strand"] == new[key]["strand"], key
        assert old[key]["n"] == new[key]["n"], key
        # same anchor set (subsample order may differ)
        oa = set(zip(old[key]["aq"].tolist(), old[key]["at"].tolist()))
        na = set(zip(new[key]["aq"].tolist(), new[key]["at"].tolist()))
        assert oa == na, key


def test_self_join_contained_and_revcomp():
    rng = np.random.default_rng(107)
    g = rng.integers(0, 4, size=1000).astype(np.uint8)
    pairs = _valid_pairs(_candidates_selfjoin([g, g[200:500],
                                               revcomp_codes(g[300:900])]))
    assert (0, 1) in pairs and (0, 2) in pairs
    assert pairs[(0, 2)]["strand"] == 1
