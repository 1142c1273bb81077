"""fast_duplicate_finder_spark — a from-scratch PySpark-native near-duplicate
detection + clustering engine.

Generalizes the phased dedup cascade of maxthedon/fast-duplicate-finder
(reference at /root/reference, Go; see SURVEY.md) to distributed
near-duplicate detection over tables of multi-turn conversation transcripts:

    assemble -> prefilter (size) -> partial hash -> full hash (exact clusters)
             -> group (folder-analogue) dedup -> MinHash/LSH + SimHash +
                shared-span near-dup candidates -> verify -> connected
                components -> clusters + report

Everything is expressed with the PySpark DataFrame API (Catalyst-optimized,
whole-stage-codegen) with Arrow-vectorized pandas UDFs only for the
MinHash/SimHash/suffix-array kernels. No code is copied from the reference;
citations in docstrings are behavioral parity pointers only.
"""

from fast_duplicate_finder_spark.config import PipelineConfig
from fast_duplicate_finder_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]
__version__ = "0.1.0"
