"""``python -m cluster_generator_tpu`` entry point."""

import sys

from .cli import main

sys.exit(main())
