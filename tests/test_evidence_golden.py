"""Golden differential: evidence_table vs the reference min_ev_table.py.

Runs /root/reference/script/min_ev_table.py (pure python3 + scipy, both
present) as a subprocess for several (readlen, intseg, stddev, hcov)
parameter sets and asserts the full (dist, exp_ev, min_ev) table equals
``hylight_tpu.assembly.evidence.evidence_table`` row for row.
Reference math: min_ev_table.py:31-151.
"""

import os
import subprocess
import sys

import pytest

from hylight_tpu.assembly.evidence import evidence_table

MIN_EV = "/root/reference/script/min_ev_table.py"

pytestmark = pytest.mark.skipif(not os.path.exists(MIN_EV),
                                reason="reference script not available")


def run_reference(readlen, intseg, stddev, hcov, tmp_path):
    out = tmp_path / "exp_ev_table.tsv"
    res = subprocess.run(
        [sys.executable, MIN_EV, "-l", str(readlen), "-i", str(intseg),
         "-s", str(stddev), "-c", str(hcov), "-o", str(out)],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    table = {}
    for line in out.read_text().splitlines():
        if line.startswith("#"):
            continue
        dist, exp_ev, min_ev = line.split("\t")
        table[int(dist)] = (int(exp_ev), int(min_ev))
    return table


@pytest.mark.parametrize("readlen,intseg,stddev,hcov", [
    (250, 150, 20, 20),      # MiSeq-ish defaults
    (150, 200, 50, 10),
    (100, 50, 15, 30),
    (250, -100, 30, 15),     # overlapping-mates insert (intseg < 0)
    (75, 400, 80, 5),
])
def test_golden_table(readlen, intseg, stddev, hcov, tmp_path):
    ref = run_reference(readlen, intseg, stddev, hcov, tmp_path)
    mine = evidence_table(readlen=readlen, intseg=intseg, stddev=stddev,
                          hcov=hcov)
    assert mine == ref
