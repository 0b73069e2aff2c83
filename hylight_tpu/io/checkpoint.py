"""Stage-boundary checkpointing.

The reference is *implicitly* checkpointed: every stage writes named files
under ``out/tmp/`` so a crashed run can be manually resumed at a stage
boundary (SURVEY.md §5). Here that contract is explicit: each pipeline
stage saves its ReadSet artifact; on re-run, present artifacts are loaded
and their stages skipped.
"""

from __future__ import annotations

import os
from typing import Optional

from hylight_tpu.io.fastx import read_fastx, write_fastq
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.utils import get_logger

log = get_logger()


class Checkpointer:
    """FASTQ-backed stage artifacts under ``<dir>/`` (no-op when dir=None)."""

    def __init__(self, directory: Optional[str]):
        self.dir = directory
        if directory:
            os.makedirs(directory, exist_ok=True)

    def _path(self, name: str) -> str:
        assert self.dir is not None
        return os.path.join(self.dir, f"{name}.fq")

    def load(self, name: str) -> Optional[ReadSet]:
        if not self.dir:
            return None
        p = self._path(name)
        if not os.path.exists(p) or not os.path.exists(p + ".done"):
            return None
        log.info("[CK] resuming stage '%s' from %s", name, p)
        if os.path.getsize(p) == 0:   # a stage may legitimately emit 0 reads
            return ReadSet.from_seqs([])
        return read_fastx(p)

    def save(self, name: str, rs: ReadSet) -> None:
        if not self.dir:
            return
        p = self._path(name)
        write_fastq(p, rs)
        with open(p + ".done", "w") as f:
            f.write("ok\n")
        log.info("[CK] checkpointed stage '%s' (%d reads)", name, rs.n)
