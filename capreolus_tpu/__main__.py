"""`python -m capreolus_tpu` entry point."""

import sys

from capreolus_tpu.run import main

sys.exit(main())
