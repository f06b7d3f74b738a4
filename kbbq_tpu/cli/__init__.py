"""CLI: ``kbbq-tpu {recalibrate,benchmark,plot}`` (SURVEY.md §8.1 L5).

Flag names/semantics mirror the reference CLI (-k, -g, -c, -a/--alpha,
-u/--use-oq, -s/--set-oq; SURVEY.md §3.1 C1) for drop-in parity.
"""

from .main import main
