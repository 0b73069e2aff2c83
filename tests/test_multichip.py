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
