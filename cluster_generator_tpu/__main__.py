"""``python -m cluster_generator_tpu`` entry point."""

import sys

from .cli import main

if __name__ == "__main__":  # guard: tools that IMPORT this module
    sys.exit(main())        # (pytest --pyargs, pkgutil walks) must not
                            # run the CLI against their own sys.argv
