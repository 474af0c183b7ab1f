import sys

from ranklib_tpu.cli import main

sys.exit(main())
