import numpy as np

from hylight_tpu.io.readset import ReadSet, revcomp_codes
from hylight_tpu.ops.minimizers import minimizers
from hylight_tpu.overlap.seed import build_index, collect_anchors, group_candidates

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
