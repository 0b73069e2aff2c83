import os

import numpy as np

from hylight_tpu.io.readset import ReadSet
from hylight_tpu.io.checkpoint import Checkpointer
from hylight_tpu.graph.gfa import arcs_to_gfa, unitigs_to_gfa
from hylight_tpu.graph.string_graph import ArcSet, Unitig, unitig_seqs
from hylight_tpu.utils import get_logger


def test_checkpoint_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path))
    assert ck.load("x") is None
    rs = ReadSet.from_seqs(["ACGT", "GGGG"], names=["a", "b"])
    ck.save("x", rs)
    back = ck.load("x")
    assert back is not None and back.n == 2
    assert back.get_str(0) == "ACGT" and back.names == ["a", "b"]


def test_checkpoint_disabled():
    ck = Checkpointer(None)
    rs = ReadSet.from_seqs(["ACGT"])
    ck.save("x", rs)          # no-op, no crash
    assert ck.load("x") is None


def test_gfa_output(rng):
    g = rng.integers(0, 4, size=400).astype(np.uint8)
    reads = ReadSet.from_seqs([g[:300], g[100:400]], names=["r0", "r1"])
    u = Unitig(verts=[0, 2], arc_lens=[100], circular=False)
    contigs = unitig_seqs([u], reads)
    gfa = unitigs_to_gfa([u], contigs, reads)
    assert gfa.startswith("H\tVN:Z:1.0")
    assert "\nS\t" in gfa and "\na\t" in gfa

    arcs = ArcSet(v=np.array([0]), w=np.array([2]),
                  l=np.array([100], dtype=np.int32),
                  ol=np.array([200], dtype=np.int32), n_reads=2)
    g2 = arcs_to_gfa(arcs, reads)
    assert "L\tr0\t+\tr1\t+\t200M" in g2


def test_rotating_logfile(tmp_path):
    lf = str(tmp_path / "run.log")
    log = get_logger("hylight_tpu_testlogger", logfile=lf)
    log.info("hello stage")
    for h in log.handlers:
        h.flush()
    assert os.path.exists(lf)
    assert "hello stage" in open(lf).read()


def test_write_outputs_emits_gfa(tmp_path):
    """W7: the pipeline's GFA artifacts (contigs{N}.gfa, miniasm
    ma_ug_print parity) are written next to the FASTA outputs."""
    import numpy as np
    from hylight_tpu.io.readset import ReadSet
    from hylight_tpu.assembly.pipeline import AssemblyOutputs, write_outputs
    rs = ReadSet.from_seqs([np.zeros(10, np.uint8)], names=["c0"])
    out = AssemblyOutputs(final_contigs=rs, long_contigs=rs,
                          short_stageb=rs, all_contigs=rs,
                          gfa=["H\tVN:Z:1.0\nS\tu0\tAAAA\tLN:i:4\n"])
    write_outputs(out, str(tmp_path))
    gfa = (tmp_path / "contigs1.gfa").read_text()
    assert gfa.startswith("H\tVN:Z:1.0")
    assert "S\tu0" in gfa
