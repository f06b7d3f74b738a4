"""Device-resident state: Bloom filters + covariate tables + checkpoints.

SURVEY.md §8.1 L2.  The natural checkpoints are pass boundaries (SURVEY.md
§6): Bloom A, Bloom B and the covariate tables are each a single dense
array, serialized with numpy.
"""

from .bloom import BloomState
from .covariate import CovariateAccumulator
