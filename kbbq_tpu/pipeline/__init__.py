"""The four recalibration passes as jitted device programs.

SURVEY.md §8.1 L3 / §4.1 pass structure.  Single-chip path here; the
multi-chip shardings wrap these same step functions (kbbq_tpu/parallel).
"""

from .recalibrate import RecalConfig, RecalPipeline, recalibrate_arrays, recalibrate_fastq
