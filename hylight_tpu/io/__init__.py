from hylight_tpu.io.readset import ReadSet  # noqa: F401
from hylight_tpu.io.fastx import read_fastx, write_fasta, write_fastq  # noqa: F401
