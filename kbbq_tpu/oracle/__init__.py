"""Pure-NumPy executable spec for kbbq-tpu (the parity authority).

Implements SURVEY.md Appendix A with the decisions in DECISIONS.md.  Every
JAX kernel in ``kbbq_tpu.ops`` is unit-tested bit-for-bit against this
package (SURVEY.md §5 strategy: golden-output equivalence against a trusted
oracle, the role GATK plays for the reference tool).
"""

from .kmers import (
    encode_seq,
    decode_seq,
    fmix32,
    canonical_kmers,
    kmer_hashes,
    sample_hash,
)
from .bloom import BloomParams, OracleBloom
from .lighter import trusted_kmer_mask, infer_read_errors
from .covariate import CovariateTables, accumulate_read, compute_skips
from .gatk import (
    empirical_quality,
    compute_deltas,
    build_recal_table,
)
from .pipeline import OracleConfig, recalibrate_reads
