import numpy as np
import jax
import jax.numpy as jnp

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.overlap.block import make_block_fn
from hylight_tpu.parallel.mesh import make_mesh, shard_rows
from hylight_tpu.parallel.sharded_overlap import make_sharded_overlap_fn

CFG = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.9,
                    min_anchors=4, min_chain_score=60, max_occ=16,
                    anchors_per_pair=64, gap_tile=32)


def _readmatrix(rng, n=16, glen=2400):
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    step = (glen - 600) // (n - 1)
    rs = ReadSet.from_seqs([g[i * step:i * step + 600] for i in range(n)])
    return rs.to_padded(max_len=640)


def _valid_pairs(qid, tid, valid):
    return {(int(q), int(t)) for q, t, v in
            zip(np.array(qid), np.array(tid), np.array(valid)) if v}


def test_sharded_overlap_matches_single(rng):
    seqs, lens = _readmatrix(rng)
    mesh = make_mesh(8)
    fn = make_sharded_overlap_fn(mesh, CFG, mcap=256, max_pairs=64)
    seqs_d = jax.device_put(jnp.asarray(seqs), shard_rows(mesh))
    lens_d = jax.device_put(jnp.asarray(lens), shard_rows(mesh))
    out, n_valid = fn(seqs_d, lens_d)
    got = _valid_pairs(out["qid"], out["tid"], out["valid"])

    single = make_block_fn(CFG, mcap=256, max_pairs=512)
    ch, ext, sc = single(jnp.asarray(seqs), jnp.asarray(lens))
    want = _valid_pairs(ch.qid, ch.tid, sc.valid)

    assert got == want and len(got) > 0
    assert int(n_valid) == len(got)


def test_sharded_identity_values_match(rng):
    seqs, lens = _readmatrix(rng)
    mesh = make_mesh(8)
    fn = make_sharded_overlap_fn(mesh, CFG, mcap=256, max_pairs=64)
    out, _ = fn(jax.device_put(jnp.asarray(seqs), shard_rows(mesh)),
                jax.device_put(jnp.asarray(lens), shard_rows(mesh)))
    v = np.array(out["valid"])
    ident = np.array(out["identity"])[v]
    assert (ident > 0.99).all()


def test_ring_overlap_matches_single(rng):
    from hylight_tpu.parallel.sharded_overlap import make_ring_overlap_fn

    seqs, lens = _readmatrix(rng)
    mesh = make_mesh(8)
    fn = make_ring_overlap_fn(mesh, CFG, mcap=256, max_pairs=64)
    seqs_d = jax.device_put(jnp.asarray(seqs), shard_rows(mesh))
    lens_d = jax.device_put(jnp.asarray(lens), shard_rows(mesh))
    out, n_valid = fn(seqs_d, lens_d)
    got = _valid_pairs(out["qid"], out["tid"], out["valid"])

    single = make_block_fn(CFG, mcap=256, max_pairs=512)
    ch, ext, sc = single(jnp.asarray(seqs), jnp.asarray(lens))
    want = _valid_pairs(ch.qid, ch.tid, sc.valid)

    assert got == want and len(got) > 0
    # each unordered pair produced exactly once across the whole ring
    assert int(n_valid) == len(got)
    v = np.array(out["valid"])
    ident = np.array(out["identity"])[v]
    assert (ident > 0.99).all()


def test_find_overlaps_mesh_matches_single():
    """Pipeline-level integration (VERDICT #2): find_overlaps(mesh=) must
    return the same overlap set as the single-chip path — the engine call
    every assembly stage uses, not a standalone fn."""
    from hylight_tpu.overlap.engine import find_overlaps

    rng2 = np.random.default_rng(33)
    glen = 6000
    g = rng2.integers(0, 4, size=glen).astype(np.uint8)
    reads = [g[s:s + 700].copy() for s in range(0, glen - 700, 140)]
    # one revcomp + a few errors for realism
    from hylight_tpu.io.readset import revcomp_codes
    reads[5] = revcomp_codes(reads[5])
    rs = ReadSet.from_seqs(reads)

    mesh = make_mesh(8)
    t_mesh = find_overlaps(rs, cfg=CFG, mesh=mesh)
    t_single = find_overlaps(rs, cfg=CFG, query_block=16)

    def keyed(t):
        return {(int(q), int(tt)): (int(s), int(qs), int(qe), int(ts),
                                    int(te))
                for q, tt, s, qs, qe, ts, te in
                zip(t.qid, t.tid, t.strand, t.qs, t.qe, t.ts, t.te)}

    km, ks = keyed(t_mesh), keyed(t_single)
    assert set(km) == set(ks) and len(km) > 0
    for k in km:
        assert km[k] == ks[k], k


def test_bucket_overlap_matches_single():
    """v3 minimizer-bucket all_to_all exchange (SURVEY §2.5): hash-range
    routing + roll self-join per bucket + anchors routed home must find the
    same pairs as the single-chip block."""
    from hylight_tpu.parallel.sharded_overlap import make_bucket_overlap_fn

    rng2 = np.random.default_rng(44)
    seqs, lens = _readmatrix(rng2)
    n, L = seqs.shape
    mesh = make_mesh(8)
    fn = make_bucket_overlap_fn(mesh, CFG, mcap=256, max_pairs=64,
                                n_reads=n, max_len=L)
    out, n_valid, overflow = fn(
        jax.device_put(jnp.asarray(seqs), shard_rows(mesh)),
        jax.device_put(jnp.asarray(lens), shard_rows(mesh)))
    assert int(overflow) == 0
    got = _valid_pairs(out["qid"], out["tid"], out["valid"])

    single = make_block_fn(CFG, mcap=256, max_pairs=512)
    ch, ext, sc = single(jnp.asarray(seqs), jnp.asarray(lens))
    want = _valid_pairs(ch.qid, ch.tid, sc.valid)
    assert got == want and len(got) > 0
    assert int(n_valid) == len(got)
