"""``python -m kbbq_tpu`` entry point."""

import sys

from .cli.main import main

sys.exit(main())
