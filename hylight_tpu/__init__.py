"""hylight_tpu — a TPU-native strain-aware hybrid metagenome assembly engine.

Brand-new implementation (JAX/XLA/Pallas/pjit + host C++) of the capabilities
of HyLight (reference: kangxiongbin/HyLight, surveyed in /root/repo/SURVEY.md).

Layer map (TPU-first, not a port of the reference's process pipeline):

- ``io``       read ingest: FASTQ/FASTA -> dense code arrays (ReadSet)
- ``ops``      device kernels: minimizers, anchor chaining, banded extend,
               pileup consensus, k-mer spectra
- ``overlap``  the overlap engine: seeding -> candidate pairing -> chaining
               -> extension -> PAF-equivalent overlap table + filters + the
               SNP-aware cross-strain rejection
- ``graph``    string-graph ops (arc classification, transitive reduction,
               tip/bubble removal, unitigs), union-find clustering, cliques
- ``assembly`` long-read layout+polish, strain-aware short-read OLC core,
               stage-b contig extension, full hybrid pipeline
- ``correct``  k-mer spectrum short-read correction, long-read correction
- ``parallel`` device mesh / sharding helpers, distributed overlap engine
"""

__version__ = "0.1.0"

from hylight_tpu.config import Config  # noqa: F401
from hylight_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
